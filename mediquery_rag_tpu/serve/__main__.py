from mediquery_rag_tpu.serve.server import main

main()
