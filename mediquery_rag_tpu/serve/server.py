"""HTTP serving front: the deployable face of the retrieval engine.

Stdlib-only (``http.server`` — the image has no web framework, and none is
needed for a thread-per-request front over the micro-batcher). Concurrent
requests coalesce into shared TPU batches exactly like the CLI sessions do
(serve/batcher.py); the Self-RAG graph runs per request for /qa.

The reference had no server at all (single synchronous CLI user,
SURVEY §2c) — this is a net-new production component.

Endpoints (JSON in/out):
  POST /search  {"query": str | "queries": [str], "k": int=5,
                 "where": {...}=null}        -> {"results": [[doc...]]}
  POST /qa      {"question": str, "user_id": str="anonymous"}
                                             -> {"answer": str, "docs": [...]}
  GET  /healthz                              -> {"ok": true, "stats": {...}}
"""

from __future__ import annotations

import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from mediquery_rag_tpu.serve.batcher import BatchingSearchService


def _doc_json(d) -> dict:
    return {"text": d.text, "metadata": d.metadata, "score": d.score}


class SearchServer:
    """Wires a DocumentStore (and optionally a graph factory) behind HTTP.

    ``make_graph_app``: optional zero-arg callable returning a compiled
    Self-RAG graph whose retrieve node uses THIS server's batcher (pass
    ``server.service`` as the store when building nodes) — /qa is disabled
    when absent.
    """

    def __init__(self, store, *, make_graph_app=None, max_batch: int = 64,
                 max_wait_ms: float = 3.0):
        self.store = store
        self.service = BatchingSearchService(
            store.batch_search, max_batch=max_batch, max_wait_ms=max_wait_ms)
        self._make_graph_app = make_graph_app
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- request handling ------------------------------------------------

    def _handle_search(self, body: dict) -> dict:
        queries = body.get("queries")
        if queries is None:
            queries = [body["query"]]
        k = int(body.get("k", 5))
        where = body.get("where")
        if where is not None:
            # where-filtering needs the store's widened fallback, not the
            # batcher (mixed filters cannot share one engine call)
            rows = self.store.batch_search(queries, k, where=where)
        else:
            futs = [self.service.submit(q, k) for q in queries]
            rows = [f.result(timeout=30) for f in futs]
        return {"results": [[_doc_json(d) for d in row] for row in rows]}

    def _handle_qa(self, body: dict) -> dict:
        if self._make_graph_app is None:
            raise ValueError("/qa is not configured (no graph factory)")
        from mediquery_rag_tpu.llm.messages import user

        app = self._make_graph_app()
        events = list(app.stream(
            {"messages": [user(body["question"])],
             "user_id": body.get("user_id", "anonymous")},
            thread_id=body.get("thread_id", f"http_{uuid.uuid4().hex[:8]}")))
        final = events[-1][1]
        return {
            "answer": final.get("final_answer", ""),
            "docs": final.get("documents", []),
        }

    # -- lifecycle ---------------------------------------------------------

    def start(self, host: str = "127.0.0.1", port: int = 8384) -> int:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):           # quiet
                pass

            def _send(self, code: int, payload: dict):
                data = json.dumps(payload, ensure_ascii=False).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"ok": True,
                                     "stats": dict(outer.service.stats)})
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    if self.path == "/search":
                        self._send(200, outer._handle_search(body))
                    elif self.path == "/qa":
                        self._send(200, outer._handle_qa(body))
                    else:
                        self._send(404, {"error": "not found"})
                except Exception as e:          # fail-open JSON error
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self._httpd.server_address[1]

    def shutdown(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._thread.join(timeout=5)
            self._httpd.server_close()
        self.service.shutdown()


def main() -> None:
    """``python -m mediquery_rag_tpu.serve`` — serve the app corpus."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8384)
    ap.add_argument("--fake-llm", action="store_true")
    ap.add_argument("--llm-url", default=None)
    args = ap.parse_args()

    from mediquery_rag_tpu.cli.context import AppContext
    from mediquery_rag_tpu.graph import build_medical_graph, create_nodes

    ctx = AppContext.build(
        ".", fake_llm=args.fake_llm or not args.llm_url,
        llm_url=args.llm_url or "http://localhost:11434")
    server = SearchServer(ctx.store)

    def make_app():
        nodes = create_nodes(ctx.llm, server.service,
                             web_search=ctx.web_search)
        return build_medical_graph(nodes)

    server._make_graph_app = make_app
    # prewarm every serving bucket shape BEFORE accepting traffic: the
    # first compile of each shape costs tens of seconds through the
    # remote-compile tunnel and would otherwise time out early requests
    print("prewarming engine (first XLA compiles)...", flush=True)
    for b in (1, 4, 8, 16):
        ctx.store.batch_search([f"预热{i}" for i in range(b)], k=5)
    port = server.start(args.host, args.port)
    print(f"serving on http://{args.host}:{port}  (/search /qa /healthz)")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
