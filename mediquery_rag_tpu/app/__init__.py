"""Application layer: consultation state machine, two-tier memory, risk
triage, calculators — the capabilities of the reference's
src/consultation + src/memory + src/tools, re-designed with injectable
LLM clients and live (tested) versions of features the reference left dead.
"""
