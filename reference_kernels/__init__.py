"""Slow, obviously-correct float64 numpy oracles.

These are the in-repo bit-match harness: every device kernel in
``ionotomo_tpu`` has a twin here, written independently in plain numpy at
f64, against which parity tests assert agreement within the documented
tolerance contract (SURVEY.md §7 "Precision & bit-matching").
"""
