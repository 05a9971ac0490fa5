"""Proof systems: Spartan / co-Spartan (R1CS), Jolt / co-Jolt (zkVM)."""
