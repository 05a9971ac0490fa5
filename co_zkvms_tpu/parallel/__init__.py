"""Rep3 secret sharing and MPC protocol ops as sharded JAX array programs."""
