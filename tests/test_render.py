"""Episode rendering: frame functions + GIF recording (reference renders via
pygame and records via gym RecordVideo; here rendering is host-side and
display-free)."""

import os

import numpy as np

from gpmpc_tpu.sim.render import (EpisodeRecorder, cartpole_renderer,
                                  pendulum_renderer)


class TestRenderers:
    def test_pendulum_frame(self):
        render = pendulum_renderer(size=200)
        f0 = render(np.array([0.0, 0.0]))
        f1 = render(np.array([2.0, 0.0]), action=np.array([3.0]))
        assert f0.shape == (200, 200, 3) and f0.dtype == np.uint8
        assert not np.array_equal(f0, f1)          # pose actually drawn

    def test_cartpole_frame(self):
        render = cartpole_renderer(width=300, height=200)
        f0 = render(np.array([0.0, 0.0, 0.0, 0.0]))
        f1 = render(np.array([1.0, 0.0, 0.6, 0.0]))
        assert f0.shape == (200, 300, 3) and f0.dtype == np.uint8
        assert not np.array_equal(f0, f1)

    def test_recorder_writes_gif(self, tmp_path):
        rec = EpisodeRecorder(pendulum_renderer(size=120), fps=10)
        for th in np.linspace(0, np.pi, 6):
            rec.capture(np.array([th, 0.0]))
        path = rec.save(str(tmp_path / 'ep.gif'))
        assert os.path.getsize(path) > 500
        n = rec.save_frames(str(tmp_path / 'frames'))
        assert n == 6
        assert len(os.listdir(tmp_path / 'frames')) == 6
