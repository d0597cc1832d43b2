"""Structured Streaming surface: live ingestion (S4), monotonicity guard
(F5), update-period limiting (T4), state-transition markers (T5), and the
continuously-maintained decimation cascade (T2/T3 via incremental jobs)."""
