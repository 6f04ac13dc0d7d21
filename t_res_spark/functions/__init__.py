"""Scalar / columnar function library (native column exprs + batch kernels)."""
