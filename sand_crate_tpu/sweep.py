"""Batched crates: vmapped parameter sweeps and data generation.

The reference's sweep runs 48 coefficient variants *sequentially*, each with
its own live window (main.py:21-23,26-36).  Because the TPU step is a pure
function of (state, params), variants become a leading batch axis instead:
``vmap(step)`` advances every crate simultaneously on one chip — the batched
datagen mode of BASELINE.json config #5 (1024 vmapped crates, randomized
configs).  Params are stacked pytrees, so every coefficient can differ per
crate; scene geometry is shared.
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .physics import step
from .scene import build_scene, init_state
from .state import CrateState, Params, Scene


def stack_params(params_list: Iterable[Params]) -> Params:
    """Stack per-crate Params pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def stack_states(states: Iterable[CrateState]) -> CrateState:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def grid_params(base: Params, options: dict) -> Params:
    """Cartesian-product coefficient grid -> stacked Params (main.py:26-36)."""
    keys = list(options.keys())
    variants = []
    for values in itertools.product(*(options[k] for k in keys)):
        override = {
            k: jnp.asarray(v, getattr(base, k).dtype) for k, v in zip(keys, values)
        }
        variants.append(base._replace(**override))
    return stack_params(variants)


def random_params(
    key: jax.Array, base: Params, ranges: dict[str, tuple[float, float]], n: int
) -> Params:
    """n crates with coefficients sampled log-uniform per given ranges."""
    overrides = {}
    for name, (lo, hi) in ranges.items():
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (n,))
        lo_a, hi_a = jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)
        overrides[name] = lo_a + u * (hi_a - lo_a)
    tiled = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), base)
    return tiled._replace(**{k: v for k, v in overrides.items()})


class BatchedCrates:
    """N independent crates advanced in lockstep with vmap(step).

    All crates share one Scene (geometry/capacity); params and state carry a
    leading batch axis.  ``run`` scans ticks fully on device; ``frames``
    samples a render/datagen view every k ticks.
    """

    def __init__(
        self,
        config: Config,
        batched_params: Params,
        *,
        seed: int = 0,
        scene: Optional[Scene] = None,
        **scene_kwargs,
    ) -> None:
        world = config.world_config
        # vmap over the manual-DMA pallas kernels is not supported; small
        # crates vmap best with the dense all-pairs backend (no sort/scatter
        # per crate; pure matrix math).  Past ~1k particles the dense pair
        # matrices blow up — mid-size crates use the fixed-halo chunked
        # backend (ops/chunked.py: sorted-slab windows at batch-uniform
        # offsets, so vmap stays gather-free).
        from .scene import default_capacity

        cap_guess = scene_kwargs.get("capacity") or default_capacity(
            int(world.coefficients["max_particles"])
        )
        scene_kwargs.setdefault(
            "forces_mode", "dense" if cap_guess <= 1024 else "chunked"
        )
        self.scene = scene or build_scene(world, **scene_kwargs)
        n = int(jax.tree.leaves(batched_params)[0].shape[0])
        self.n = n
        states = [init_state(world, self.scene, seed=seed + i) for i in range(n)]
        self.state = stack_states(states)
        self.params = batched_params

    def run(self, num_ticks: int):
        """Advance all crates num_ticks; returns stacked final Diagnostics."""
        live = None
        if self.scene.forces_mode == "chunked":
            # Chunked-backend sweep bound (ops/chunked.py): the largest any
            # crate's alive count can reach during this chunk of ticks,
            # batch-uniform by construction (host max + spawn slack).
            # Mid-fill datagen crates then sweep only their live-chunk
            # prefix instead of all of capacity.  The slack is a 6-sigma
            # bound on the WHOLE chunk's Binomial(flow, dt) emissions (the
            # per-tick worst case x num_ticks is ~10x looser and was
            # measured to halve the win); if a freak spawn run exceeds it,
            # the uncovered rows land in Diagnostics.neighbor_overflow —
            # counted, never silent (same channel as the halo loss).
            cur = int(jnp.max(jnp.sum(self.state.alive, axis=1)))
            exp = (
                float(np.sum(np.asarray(self.scene.src_flow)))
                * float(np.max(np.asarray(self.params.dt)))
                * num_ticks
            )
            slack = min(
                int(exp + 6.0 * exp**0.5 + 16),
                num_ticks * self.scene.num_sources * self.scene.max_spawn,
            )
            live = jnp.asarray(
                min(self.scene.capacity, cur + slack), jnp.int32
            )
        self.state, diag = _batched_rollout(
            self.state, self.params, self.scene, num_ticks, live
        )
        return diag

    def particle_counts(self) -> np.ndarray:
        return np.asarray(jnp.sum(self.state.alive, axis=1))

    def positions(self) -> np.ndarray:
        return np.asarray(self.state.pos)


@partial(jax.jit, static_argnames=("num_ticks",))
def _batched_rollout(state, params, scene, num_ticks: int, live_rows=None):
    # live_rows is closed over (NOT vmapped): inside vmap it stays an
    # unbatched scalar, which the chunked backend requires (ops/chunked.py
    # — a batched bound degrades every window slice to gather/scatter and
    # blows up the compile).
    def one(st, pr):
        def body(c, _):
            return step(c, pr, scene, live_rows=live_rows)

        final, diags = jax.lax.scan(body, st, None, length=num_ticks)
        return final, jax.tree.map(lambda x: x[-1], diags)

    return jax.vmap(one, in_axes=(0, 0))(state, params)


# Default coefficient ranges for randomized datagen crates (log-ish spans
# around the shipped scene values, config/stirring_cup.yaml:10-22).
DEFAULT_RANDOM_RANGES = {
    "viscosity": (2.0, 12.0),
    "pressure_amplifier": (10.0, 60.0),
    "surface_smoothing": (20.0, 150.0),
    "target_pressure": (-6.0, 3.0),
    "ignored_pressure": (0.05, 0.4),
}


def run_datagen(
    config: Config,
    n_crates: int,
    ticks: int,
    sample_every: int,
    out_dir,
    *,
    seed: int = 0,
    ranges: Optional[dict] = None,
    forces_mode: Optional[str] = None,
) -> dict:
    """Batched trajectory data generation (BASELINE.json config #5).

    ``n_crates`` independent crates with randomized coefficients advance in
    lockstep on one chip; every ``sample_every`` ticks a batched state frame
    (pos/alive/pressure across all crates) streams to npz shards, with the
    per-crate coefficient vectors saved alongside as labels.

    ``forces_mode`` None lets BatchedCrates pick: dense all-pairs below the
    ~1k-particle ceiling (pure (P, P) matrix math, vmaps to 1000+ crates),
    the fixed-halo chunked backend for mid-size crates.
    """
    from pathlib import Path

    import numpy as np

    from .recording import TrajectoryWriter

    base = Params.from_coefficients(config.world_config.coefficients)
    batched = random_params(
        jax.random.key(seed), base, ranges or DEFAULT_RANDOM_RANGES, n_crates
    )
    kw = {} if forces_mode is None else {"forces_mode": forces_mode}
    crates = BatchedCrates(config, batched, seed=seed, **kw)
    out_dir = Path(out_dir)
    writer = TrajectoryWriter(out_dir, shard_frames=8)
    np.savez_compressed(
        out_dir / "params.npz",
        **{name: np.asarray(getattr(batched, name)) for name in Params._fields},
    )
    n_frames = ticks // sample_every
    for i in range(n_frames):
        crates.run(sample_every)
        writer.append(
            dict(
                pos=np.asarray(crates.state.pos),
                alive=np.asarray(crates.state.alive),
                pressure=np.asarray(crates.state.pressure),
                segments=np.asarray(crates.state.segments),
            )
        )
        print(f"datagen frame {i + 1}/{n_frames} (tick {(i + 1) * sample_every})")
    path = writer.close(meta={"crates": n_crates, "sample_every": sample_every})
    print(f"wrote {n_frames} batched frames x {n_crates} crates -> {path}")
    return {"frames": n_frames, "crates": n_crates, "dir": str(path)}


def run_vmapped_sweep(config: Config, options: dict, ticks: int = 400) -> dict:
    """Run the reference's 48-variant sweep as one vmapped batch."""
    base = Params.from_coefficients(config.world_config.coefficients)
    batched = grid_params(base, options)
    crates = BatchedCrates(config, batched)
    print(f"Running {crates.n} crates x {ticks} ticks vmapped on one chip...")
    diag = crates.run(ticks)
    counts = crates.particle_counts()
    keys = list(options.keys())
    print(f"{'variant':<8} " + " ".join(f"{k[:12]:>12}" for k in keys) + "  particles")
    for i, values in enumerate(
        itertools.product(*(options[k] for k in keys))
    ):
        print(
            f"{i:<8} "
            + " ".join(f"{v:>12}" for v in values)
            + f"  {counts[i]}"
        )
    return {"particle_counts": counts, "diagnostics": diag}
