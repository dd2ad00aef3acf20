"""Host-side simulation handle — the reference ``Crate`` API on a TPU engine.

Keeps the reference's crate-state API surface (BASELINE.json: "Keep the
reference's ... crate state API intact"): ``physics_tick()``,
``editable_coefficients()``, attribute-style coefficient get/set (used by the
playback layer for live editing, /root/reference/src/playback.py:221-226),
and the ``particles`` / ``particle_velocities`` / ``particles_pressure`` /
``segments`` / ``debug_prints`` views (playback.py:77-81) — while the actual
state lives on device as a :class:`~sand_crate_tpu.state.CrateState` pytree
advanced by the jitted step.

Two execution modes:
* ``physics_tick()`` — one jitted step per call, donated state, for
  interactive playback.  Coefficient edits swap the Params pytree (no
  recompile: params are traced arrays).
* ``run()`` / ``stream_frames()`` — ``lax.scan`` chunks fully resident on
  device, sampling one render frame per chunk; this is the fast path the
  benchmarks use and what feeds recording without blocking the step loop.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import numpy as np

from .config import COEFFICIENT_NAMES, Config, WorldConfig
from .diagnostics import ForceMonitor, PhaseTimer
from .physics import rollout, step, trajectory
from .scene import build_scene, init_state
from .state import FORCE_LABELS, CrateState, Params

import yaml


class Crate:
    """TPU-native equivalent of the reference Crate (crate.py:19-371)."""

    _ENGINE_ATTRS = {
        "world_config",
        "scene",
        "state",
        "params",
        "debug_timer",
        "force_monitor",
        "debug_prints",
        "debug_arrows",
        "_step_fn",
        "_seed",
        "_coeff_overrides",
        "velocity_arrows_every",
        "instrument",
    }

    def __init__(
        self,
        world_config: WorldConfig,
        *,
        seed: int = 0,
        capacity: Optional[int] = None,
        max_neighbors: int = 20,
        cell_capacity: Optional[int] = None,
        enable_spring: bool = False,
        forces_mode: str = "auto",
        pmajor_symm: Optional[bool] = None,
        instrument: bool = False,
    ) -> None:
        object.__setattr__(self, "world_config", world_config)
        object.__setattr__(self, "instrument", instrument)
        scene = build_scene(
            world_config,
            capacity=capacity,
            max_neighbors=max_neighbors,
            cell_capacity=cell_capacity,
            enable_spring=enable_spring,
            forces_mode=forces_mode,
            pmajor_symm=pmajor_symm,
            # Instrumented runs want the true per-force monitor split, so
            # they keep tension/pressure as separate pair sums (the folded
            # fast path merges them — Scene.fold_pairs).
            fold_pairs=False if instrument else None,
        )
        object.__setattr__(self, "scene", scene)
        object.__setattr__(self, "state", init_state(world_config, scene, seed=seed))
        object.__setattr__(
            self, "params", Params.from_coefficients(world_config.coefficients)
        )
        object.__setattr__(self, "debug_timer", PhaseTimer())
        object.__setattr__(self, "force_monitor", ForceMonitor(FORCE_LABELS))
        object.__setattr__(self, "debug_prints", "")
        object.__setattr__(self, "debug_arrows", [])
        object.__setattr__(self, "_seed", seed)
        object.__setattr__(self, "velocity_arrows_every", 0)
        object.__setattr__(self, "_coeff_overrides", {})
        object.__setattr__(
            self, "_step_fn", jax.jit(step, donate_argnums=(0,))
        )

    # -- coefficient surface (playback live-editing contract) ---------------

    def editable_coefficients(self) -> list[str]:
        """Reference: crate.py:59-60 — every coefficient is editable."""
        return list(COEFFICIENT_NAMES)

    def __getattr__(self, name: str):
        # Called only when normal lookup fails: map coefficient names to params.
        if name in COEFFICIENT_NAMES:
            value = np.asarray(getattr(object.__getattribute__(self, "params"), name))
            return value if value.ndim else value.item()
        raise AttributeError(name)

    def __setattr__(self, name: str, value) -> None:
        if name in COEFFICIENT_NAMES:
            if name == "particle_radius":
                self._maybe_regrid(float(np.asarray(value)))
            new_params = self.params._replace(
                **{
                    name: jax.numpy.asarray(
                        value, dtype=getattr(self.params, name).dtype
                    )
                }
            )
            object.__setattr__(self, "params", new_params)
            self._coeff_overrides[name] = value
        elif name in self._ENGINE_ATTRS:
            object.__setattr__(self, name, value)
        else:
            raise AttributeError(f"Unknown attribute {name!r}")

    def _maybe_regrid(self, radius: float) -> None:
        """Rebuild the neighbor grid when a live radius edit outgrows it.

        The grid backends (gather/cellwise/pallas) search the 3x3 cell
        stencil, correct only while diameter <= cell_size; cell dims are
        static Scene aux frozen at build time, while particle_radius is a
        live-editable Params leaf (reference contract: crate.py:59-60 — the
        reference recomputes its strips from the current diameter every tick,
        collision_detector.py:124-128, so it never has this hazard).  When an
        edit pushes 2*radius past cell_size, rebuild the Scene around the new
        diameter — a one-time recompile on the next tick, instead of silently
        missing in-range pairs.  The dense backend is stencil-free and needs
        nothing.
        """
        scene = self.scene
        if scene.forces_mode == "dense" or 2.0 * radius <= scene.cell_size:
            return
        world = self.world_config
        coeff = dict(world.coefficients)
        coeff["particle_radius"] = radius
        import dataclasses as _dc

        new_world = _dc.replace(world, coefficients=coeff)
        new_scene = build_scene(
            new_world,
            capacity=scene.capacity,
            max_neighbors=scene.max_neighbors,
            cell_capacity=scene.cell_capacity,
            enable_spring=scene.enable_spring,
            forces_mode=scene.forces_mode,
            pmajor_w=scene.pmajor_w,
            pmajor_cs=scene.pmajor_cs,
            pmajor_split=scene.pmajor_split,
            fold_pairs=scene.fold_pairs,
            pmajor_symm=scene.pmajor_symm,
        )
        object.__setattr__(self, "scene", new_scene)

    @property
    def diameter(self) -> float:
        return 2.0 * float(np.asarray(self.params.particle_radius))

    # -- state views (playback read contract, playback.py:77-81) -------------

    def _alive_np(self) -> np.ndarray:
        return np.asarray(self.state.alive)

    @property
    def particles(self) -> np.ndarray:
        alive = self._alive_np()
        return np.asarray(self.state.pos)[alive]

    @property
    def particle_velocities(self) -> np.ndarray:
        return np.asarray(self.state.vel)[self._alive_np()]

    @property
    def particles_pressure(self) -> np.ndarray:
        return np.asarray(self.state.pressure)[self._alive_np()]

    @property
    def segments(self) -> np.ndarray:
        valid = np.asarray(self.scene.seg_valid)
        return np.asarray(self.state.segments)[valid]

    @property
    def particle_count(self) -> int:
        return int(self._alive_np().sum())

    @property
    def tick(self) -> int:
        return int(np.asarray(self.state.tick))

    # -- stepping -------------------------------------------------------------

    def physics_tick(self) -> None:
        """Advance one tick (interactive path; reference crate.py:91-129).

        With ``instrument=True`` the tick runs as separately-jitted phase
        programs so ``debug_timer`` shows the reference-style per-phase
        breakdown (crate.py:97-124) in the overlay; the default is the fused
        single-program step.
        """
        if self.instrument:
            from .instrument import instrumented_tick

            new_state, diag = instrumented_tick(
                self.state, self.params, self.scene, self.debug_timer
            )
            self.state = new_state
            force_dv = np.asarray(diag.force_dv)
        else:
            with self.debug_timer("Step"):
                new_state, diag = self._step_fn(self.state, self.params, self.scene)
                self.state = new_state
            with self.debug_timer("Sync"):
                force_dv = np.asarray(diag.force_dv)
        self.force_monitor.update(force_dv)
        self.set_debug_prints(diag)
        if self.velocity_arrows_every:
            self.update_velocity_arrows(self.velocity_arrows_every)

    def update_velocity_arrows(self, every: int = 25, scale: float = 0.02) -> None:
        """Fill ``debug_arrows`` with sampled per-particle velocity vectors
        (the debug overlay channel of reference crate.py:34,94 +
        playback.py:95-107, which upstream ships present but unpopulated)."""
        pts = self.particles[::every]
        vecs = self.particle_velocities[::every] * scale
        object.__setattr__(self, "debug_arrows", list(zip(pts, vecs)))

    def run(self, num_ticks: int) -> None:
        """Advance ``num_ticks`` fully on device (single scan, no host sync)."""
        self.state, diag = rollout(self.state, self.params, self.scene, num_ticks)
        self.force_monitor.update(np.asarray(diag.force_dv))
        self.set_debug_prints(diag)

    def stream_frames(
        self, num_frames: int, ticks_per_frame: int = 1, chunk_frames: int = 16
    ) -> Iterator[dict]:
        """Yield render frames while stepping in device-resident chunks.

        Double-buffered: the next chunk is dispatched before the previous
        chunk's frames are pulled to host, so rendering/recording never blocks
        the step loop (the async device->host trajectory path BASELINE.json
        requires; replaces the reference's grow-in-RAM frame list,
        playback.py:49,85).
        """
        pending = None
        frames_left = num_frames
        while frames_left > 0 or pending is not None:
            if frames_left > 0:
                n = min(chunk_frames, frames_left)
                frames_left -= n
                self.state, frames = trajectory(
                    self.state, self.params, self.scene, n, ticks_per_frame
                )
            else:
                frames = None
            if pending is not None:
                ready = jax.device_get(pending)  # previous chunk, now computed
                n_prev = ready["pos"].shape[0]
                for i in range(n_prev):
                    yield {k: v[i] for k, v in ready.items()}
            pending = frames
        # flush handled by loop exit

    # -- observability ---------------------------------------------------------

    def set_debug_prints(self, diag=None) -> None:
        """Same overlay text layout as the reference (crate.py:131-136)."""
        text = f"Tick: {self.tick}\n"
        count = (
            int(np.asarray(diag.particle_count)) if diag is not None else self.particle_count
        )
        text += f"Particles: {count}\n"
        if diag is not None:
            bad = int(np.asarray(diag.non_finite))
            dropped = int(np.asarray(diag.neighbor_overflow))
            if bad:
                text += f"WARNING non-finite particles: {bad}\n"
            if dropped:
                text += f"cell-capacity overflow: {dropped}\n"
            truncated = int(np.asarray(diag.spawn_truncated))
            if truncated:
                text += f"emission truncated: {truncated}\n"
        text += self.debug_timer.report()
        text += f"\n\n{self.force_monitor.report()}"
        text += f"\n\n{self.get_coefficient_debug()}"
        self.debug_prints = text

    def get_coefficient_debug(self) -> str:
        """Live coefficient dump (crate.py:367-371)."""
        items = []
        for name in self.editable_coefficients():
            v = np.asarray(getattr(self.params, name))
            items.append({name: v.tolist() if v.ndim else float(v)})
        return yaml.dump(items)

    def current_coefficients(self) -> dict:
        return self.params.to_coefficients()

    # -- checkpoint / resume -----------------------------------------------

    def save_checkpoint(self, path) -> "Path":
        """Snapshot the full device state + coefficients to one npz file."""
        from .recording import save_checkpoint

        return save_checkpoint(path, self.state, self.params)

    def restore_checkpoint(self, path) -> None:
        """Resume exactly from a :meth:`save_checkpoint` snapshot.

        The checkpoint's capacity must match this crate's scene (the scene is
        rebuilt from config; only dynamic state and coefficients are stored).
        """
        from .recording import load_checkpoint

        state, params = load_checkpoint(path)
        if state.pos.shape[0] != self.scene.capacity:
            raise ValueError(
                f"checkpoint capacity {state.pos.shape[0]} != scene capacity "
                f"{self.scene.capacity}; rebuild the crate with matching capacity"
            )
        object.__setattr__(self, "state", state)
        object.__setattr__(self, "params", params)


def crate_from_config(config: Config, **kwargs) -> Crate:
    return Crate(config.world_config, **kwargs)
