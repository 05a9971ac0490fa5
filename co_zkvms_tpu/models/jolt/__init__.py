"""Jolt zkVM (RV32I + Lasso lookups) and its Rep3 collaborative prover."""
