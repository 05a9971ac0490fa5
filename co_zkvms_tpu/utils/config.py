"""Deployment/mesh configuration (maps mpc-net's TOML NetworkConfig).

The reference configures a QUIC star topology per party/worker
(mpc-net/src/config.rs:167-311). The TPU-native analog is a mesh layout:
which mesh axes exist ("party", "chunk"), their sizes, and artifact paths.
TOML-driven with validation, like the reference's NetworkConfigFile ->
NetworkConfig split.
"""

from __future__ import annotations

import dataclasses
import os
import tomllib


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Validated run configuration."""

    n_parties: int = 3               # fixed by Rep3
    log_num_chunks: int = 0          # hypercube sharding (reference: workers)
    party_on_mesh: bool = False      # place party axis on the device mesh
    artifacts_dir: str = "artifacts"
    srs_seed: int = 0

    @property
    def n_chunks(self) -> int:
        return 1 << self.log_num_chunks

    def validate(self, n_devices: int):
        need = self.n_chunks * (self.n_parties if self.party_on_mesh else 1)
        if need > n_devices:
            raise ValueError(
                f"config needs {need} devices, only {n_devices} available"
            )
        if self.n_parties != 3:
            raise ValueError("Rep3 requires exactly 3 parties")
        return self

    def make_mesh(self):
        import jax
        import numpy as np
        from jax.sharding import Mesh

        devs = jax.devices()
        if self.party_on_mesh:
            n = 3 * self.n_chunks
            return Mesh(
                np.array(devs[:n]).reshape(3, self.n_chunks),
                ("party", "chunk"),
            )
        return Mesh(np.array(devs[: self.n_chunks]), ("chunk",))


def load(path: str) -> MeshConfig:
    with open(path, "rb") as f:
        raw = tomllib.load(f)
    fields = {f.name for f in dataclasses.fields(MeshConfig)}
    unknown = set(raw) - fields
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    return MeshConfig(**raw)
