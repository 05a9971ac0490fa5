"""Compute kernels: field/curve arithmetic, polynomials, sumcheck, PCS."""
