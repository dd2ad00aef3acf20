"""Playback layer: headless loop, recording output, live editing, replay.

Exercises the reference UX contract (playback.py:51-245) without a display.
Scenes are shrunk (max_particles=48) so the jitted step compiles quickly on
the CPU test mesh.
"""

import copy

import numpy as np
import pytest

from sand_crate_tpu.playback import Playback, replay


@pytest.fixture()
def small_config(stirring_cup_config):
    config = copy.deepcopy(stirring_cup_config)
    config.world_config.coefficients["max_particles"] = 48
    config.playback_config.ticks_to_record = 6
    config.playback_config.screen_x = 80
    config.playback_config.screen_y = 80
    return config


def test_headless_run_records(tmp_path, small_config):
    pb = Playback(small_config, recording_dir_path=tmp_path / "rec", headless=True)
    pb.run_live_simulation()
    assert (tmp_path / "rec" / "video.avi").exists()
    assert (tmp_path / "rec" / "video.gif").exists()
    assert (tmp_path / "rec" / "trajectory" / "index.json").exists()
    assert (tmp_path / "rec" / "trajectory" / "config.yaml").exists()
    assert pb.crate.tick == 6

    frames = replay(tmp_path / "rec", headless=True, size=(64, 64))
    assert len(frames) == 6
    assert frames[0].shape == (64, 64, 3)


def test_headless_run_no_recording(small_config):
    small_config.playback_config.save_recording = False
    pb = Playback(small_config, headless=True)
    pb.run_live_simulation(max_ticks=3)
    assert pb.crate.tick == 3


def test_edit_physics_changes_coefficient(small_config):
    small_config.playback_config.save_recording = False
    pb = Playback(small_config, headless=True)
    names = pb.crate.editable_coefficients()
    name = names[pb.current_physical_field_index % len(names)]
    before = float(np.asarray(getattr(pb.crate, name)))
    pb.edit_physics(increase=True)
    after = float(np.asarray(getattr(pb.crate, name)))
    assert after == pytest.approx(before * 1.1)
    pb.edit_physics(increase=False)
    assert float(np.asarray(getattr(pb.crate, name))) == pytest.approx(after * 0.9)


def test_reset_rebuilds_crate(small_config):
    small_config.playback_config.save_recording = False
    pb = Playback(small_config, headless=True)
    pb.run_live_simulation(max_ticks=2)
    assert pb.crate.tick == 2
    pb.reset()
    assert pb.crate.tick == 0


def test_zoom_and_pan_math(small_config):
    pb = Playback(small_config, headless=True)
    x0 = pb.crate_to_screen_coord(0.5, 0.5)
    pb.translate(np.array([10.0, 0.0]))
    x1 = pb.crate_to_screen_coord(0.5, 0.5)
    assert x1[0] != x0[0] and x1[1] == x0[1]


def _windowed_playback(small_config, **kwargs):
    """A Playback with a real (dummy-SDL) pygame display initialized."""
    import os

    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    small_config.playback_config.save_recording = False
    pb = Playback(small_config, headless=False, **kwargs)
    pb.init_display()
    return pb


def test_paused_zoom_redraws(small_config):
    """Zoom/pan events re-render immediately — the paused-simulation case
    (reference playback.py:142-148 draws inside handle_input)."""
    import pygame

    pb = _windowed_playback(small_config)
    try:
        pb.crate.physics_tick()
        pb.draw_scene()
        before = pb.last_frame.copy()
        pb.pause = True  # no tick will redraw; handle_input must
        pygame.event.post(pygame.event.Event(pygame.MOUSEWHEEL, x=0, y=1))
        pb.handle_input()
        assert pb.zoom_factor > 1.0
        assert pb.last_frame is not before  # a fresh frame was rendered
        assert not np.array_equal(pb.last_frame, before)  # zoom moved pixels
    finally:
        pygame.quit()


def test_show_indices_renders_labels(small_config):
    """Index labels add pixels the unlabeled scene doesn't have
    (reference playback.py:187-189,204-206)."""
    import pygame

    pb = _windowed_playback(small_config)
    try:
        pb.crate.physics_tick()
        plain = pb.draw_scene().copy()
        pb.show_indices = True
        labeled = pb.draw_scene().copy()
        assert not np.array_equal(labeled, plain)
    finally:
        pygame.quit()


def test_windowed_screenshot_hook(tmp_path, small_config, monkeypatch):
    """SAND_CRATE_SCREENSHOT saves the live display surface on exit — the
    no-display verification hook for the windowed loop (the reference's
    core UX is the live window, playback.py:51-73)."""
    shot = tmp_path / "shot.png"
    monkeypatch.setenv("SAND_CRATE_SCREENSHOT", str(shot))
    small_config.playback_config.save_recording = False
    import os

    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    pb = Playback(small_config, headless=False)
    pb.run_live_simulation(max_ticks=2)
    assert shot.exists() and shot.stat().st_size > 0


def test_checkpoint_resume_round_trip(tmp_path, small_config):
    from sand_crate_tpu.engine import Crate

    pb = Playback(small_config, recording_dir_path=tmp_path / "r", headless=True)
    pb.run_live_simulation()  # writes checkpoint.npz at the end
    ckpt = tmp_path / "r" / "checkpoint.npz"
    assert ckpt.exists()

    fresh = Crate(small_config.world_config)
    assert fresh.tick == 0
    fresh.restore_checkpoint(ckpt)
    assert fresh.tick == pb.crate.tick
    np.testing.assert_array_equal(fresh.particles, pb.crate.particles)

    # Resumed sim must continue identically to the original continuing.
    fresh.physics_tick()
    pb.crate.physics_tick()
    np.testing.assert_allclose(
        fresh.particles, pb.crate.particles, rtol=1e-6, atol=1e-7
    )


def test_restore_checkpoint_capacity_mismatch(tmp_path, small_config):
    from sand_crate_tpu.engine import Crate

    crate = Crate(small_config.world_config)
    crate.save_checkpoint(tmp_path / "c.npz")
    other = Crate(small_config.world_config, capacity=crate.scene.capacity * 2)
    with pytest.raises(ValueError, match="capacity"):
        other.restore_checkpoint(tmp_path / "c.npz")
