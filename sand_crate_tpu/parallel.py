"""Multi-device execution: mesh construction and sharded batched stepping.

The reference has no parallelism of any kind (SURVEY.md section 2: single
process, single NumPy heap).  The TPU-native scaling axes for this workload
are:

* **crates** (data parallel): independent vmapped crates — the parameter
  sweep / batched datagen axis (sweep.py).  Sharding the leading crate axis
  over a mesh runs each crate's whole step on one device, collective-free:
  perfect scaling over ICI.
* **space** (the sequence/context-parallel analog): sharding the particle
  axis.  Particles interact only within one diameter, so this is a spatial
  domain decomposition; under plain GSPMD the per-particle ops (ghosts, CCD,
  integration, spawn) shard cleanly while the cell-grid exchange inserts
  XLA collectives automatically.  A shard_map halo-exchange cell grid is the
  planned upgrade once multi-chip hardware is available.

``sharded_batched_step`` jits the FULL per-tick update (vmap(step) over
crates) with explicit NamedShardings on every leaf of the state/params
pytrees — this is the entry the driver's multichip dry-run exercises.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .physics import step
from .state import CrateState, Params, Scene


def make_mesh(n_devices: Optional[int] = None, axis_names=("crates", "space")) -> Mesh:
    """Build a 2D (crates x space) mesh over the first n devices.

    The space axis gets the largest power-of-2 factor <= 2 by default so
    both parallelism styles are exercised; pass n_devices=<total> from the
    dry-run.
    """
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devices)
    n_space = 2 if n % 2 == 0 and n >= 2 else 1
    n_crates = n // n_space
    grid = np.array(devices[: n_crates * n_space]).reshape(n_crates, n_space)
    return Mesh(grid, axis_names)


def state_pspecs(state: CrateState) -> CrateState:
    """PartitionSpecs for a *batched* CrateState (leading crates axis).

    Particle-axis arrays additionally shard over "space"; per-body and scalar
    leaves replicate within a crate row.
    """
    del state
    return CrateState(
        pos=P("crates", "space"),
        vel=P("crates", "space"),
        alive=P("crates", "space"),
        pressure=P("crates", "space"),
        uid=P("crates", "space"),
        segments=P("crates"),
        body_lin_vel=P("crates"),
        body_ang_vel=P("crates"),
        time=P("crates"),
        tick=P("crates"),
        key=P("crates"),
    )


def params_pspecs() -> Params:
    """Every coefficient is per-crate (vmapped sweep axis)."""
    return Params(*([P("crates")] * len(Params._fields)))


def shard_batched(mesh: Mesh, state: CrateState, params: Params):
    """Place a batched (state, params) onto the mesh."""
    s_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        state_pspecs(state),
        is_leaf=lambda x: isinstance(x, P),
    )
    p_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        params_pspecs(),
        is_leaf=lambda x: isinstance(x, P),
    )
    state = jax.tree.map(jax.device_put, state, s_sh)
    params = jax.tree.map(jax.device_put, params, p_sh)
    return state, params, (s_sh, p_sh)


def sharded_batched_step(mesh: Mesh, scene: Scene, donate: bool = True):
    """Compile vmap(step) with explicit in/out shardings over the mesh."""
    dummy = None
    s_specs = state_pspecs(dummy)
    s_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), s_specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    p_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), params_pspecs(),
        is_leaf=lambda x: isinstance(x, P),
    )
    diag_sh = NamedSharding(mesh, P())

    def batched(state, params):
        return jax.vmap(lambda s, p: step(s, p, scene))(state, params)

    return jax.jit(
        batched,
        in_shardings=(s_sh, p_sh),
        out_shardings=(s_sh, None),
        donate_argnums=(0,) if donate else (),
    )
