"""Structured Streaming jobs — SURVEY §2.9/§2.10 streaming twins.

``replay`` turns the batch ``events`` fixture into a chunked
file-stream (the S-row test harness), ``jobs`` holds the declarative
streaming topologies, ``stateful`` the applyInPandasWithState
processors (running agg, sessionization, timers, CEP, count windows).
"""
