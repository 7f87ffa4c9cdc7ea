"""Numerical building blocks: column statistics, dominant-eigenpair
extraction, special functions, rank tests, and (in deflate.py) the fused
Pallas deflation kernel."""
