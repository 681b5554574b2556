"""Reusable column-expression helpers and numeric kernels."""
