"""Synthetic renderable scene for end-to-end pipeline tests.

Renders a cloud of bright/dark blobs (stable ORB targets) onto a virtual
camera moving along a known trajectory — the deterministic stand-in for EuRoC
replay (SURVEY.md §4 test strategy).
"""
import numpy as np

from motioncheck_ccm_slam_tpu.config import Config
from motioncheck_ccm_slam_tpu.ops import lie
import jax.numpy as jnp


class SynthScene:
    def __init__(self, config: Config, n_points=600, seed=0, depth=6.0,
                 spread=8.0, speed=0.9):
        rng = np.random.default_rng(seed)
        self.config = config
        self.speed = speed
        # points ON (slightly proud of) the textured wall plane at z=7.5 —
        # like markings on a surface. Floating points far in front of the
        # background would make every feature's BRIEF context shift by tens
        # of pixels over the run (unrealistic appearance churn; real corners
        # live on surfaces).
        self.pts = np.stack(
            [
                rng.uniform(-spread, spread, n_points),
                rng.uniform(-spread * 0.6, spread * 0.6, n_points),
                7.5 - rng.uniform(0.0, 0.9, n_points),
            ],
            -1,
        ).astype(np.float32)
        self.radii = rng.integers(2, 4, n_points)
        # continuous brightness spread keeps descriptors distinctive (two
        # appearance classes would alias every blob with every other)
        lo = rng.uniform(20.0, 90.0, n_points)
        hi = rng.uniform(140.0, 250.0, n_points)
        self.bright = np.where(rng.random(n_points) < 0.4, lo, hi)
        self.K = config.camera.K()
        # static low-frequency background texture gives each blob a unique
        # neighborhood; project it from the dominant scene plane
        bg_cells = rng.uniform(70.0, 150.0, size=(24, 38)).astype(np.float32)
        self.bg_cells = bg_cells

    def _render_background(self, Tcw: np.ndarray, h: int, w: int) -> np.ndarray:
        """Project the static wall texture (plane z=depth in world) so the
        background moves consistently with the camera."""
        K = self.K
        Twc = np.linalg.inv(Tcw)
        yy, xx = np.mgrid[0:h, 0:w]
        rays = np.stack(
            [
                (xx + 0.5 - K[0, 2]) / K[0, 0],
                (yy + 0.5 - K[1, 2]) / K[1, 1],
                np.ones_like(xx, np.float32),
            ],
            -1,
        ).astype(np.float32)
        rays_w = rays @ Twc[:3, :3].T
        C = Twc[:3, 3]
        depth_plane = 7.5
        s = (depth_plane - C[2]) / np.maximum(rays_w[..., 2], 1e-6)
        px = C[0] + s * rays_w[..., 0]
        py = C[1] + s * rays_w[..., 1]
        gh, gw = self.bg_cells.shape
        u = np.clip((px + 10.0) / 20.0 * (gw - 1), 0, gw - 1.001)
        v = np.clip((py + 6.0) / 12.0 * (gh - 1), 0, gh - 1.001)
        u0 = u.astype(np.int32)
        v0 = v.astype(np.int32)
        fu = u - u0
        fv = v - v0
        c = self.bg_cells
        return (
            c[v0, u0] * (1 - fu) * (1 - fv)
            + c[v0, u0 + 1] * fu * (1 - fv)
            + c[v0 + 1, u0] * (1 - fu) * fv
            + c[v0 + 1, u0 + 1] * fu * fv
        ).astype(np.float32)

    def pose(self, t: float) -> np.ndarray:
        """Ground-truth Tcw at time t: sideways translation + slight yaw.

        Speed matches the EuRoC MAV operating point (~1.4 m/s at 20 fps ->
        ~5px/frame optical flow at 6m depth); much slower motion leaves
        per-keyframe parallax too weak to constrain landmark depths.
        """
        xi = np.array(
            [0.0, 0.012 * np.sin(t * 0.7), 0.0, self.speed * t,
             0.03 * np.sin(t), 0.0],
            np.float32,
        )
        return np.asarray(lie.se3_exp(jnp.asarray(xi)))

    def render(self, Tcw: np.ndarray) -> np.ndarray:
        cam = self.config.camera
        h, w = cam.height, cam.width
        # background: sample the wall-plane texture through the camera (the
        # wall is at z = depth in the world; rays through each pixel hit it at
        # world x,y which index the texture) — smooth bilinear look-up
        img = self._render_background(Tcw, h, w)
        R, tr = Tcw[:3, :3], Tcw[:3, 3]
        pc = self.pts @ R.T + tr
        z = pc[:, 2]
        vis = z > 0.2
        u = self.K[0, 0] * pc[:, 0] / z + self.K[0, 2]
        v = self.K[1, 1] * pc[:, 1] / z + self.K[1, 2]
        yy, xx = np.mgrid[0:h, 0:w]
        for i in np.flatnonzero(vis):
            ui, vi = u[i], v[i]
            if not (-8 < ui < w + 8 and -8 < vi < h + 8):
                continue
            r = max(2.0, self.radii[i] * 6.0 / z[i])
            ri = int(np.ceil(r)) + 2
            x0, x1 = max(0, int(ui) - ri), min(w, int(ui) + ri + 1)
            y0, y1 = max(0, int(vi) - ri), min(h, int(vi) + ri + 1)
            if x0 >= x1 or y0 >= y1:
                continue
            patch_y = yy[y0:y1, x0:x1]
            patch_x = xx[y0:y1, x0:x1]
            # anti-aliased disc: 1px feathered edge so feature positions move
            # smoothly with subpixel motion (hard-edged discs quantize corner
            # locations to whole pixels and wreck pose estimation)
            d = np.sqrt((patch_y - vi) ** 2 + (patch_x - ui) ** 2)
            alpha = np.clip(r + 0.5 - d, 0.0, 1.0)
            img[y0:y1, x0:x1] = (
                img[y0:y1, x0:x1] * (1 - alpha) + self.bright[i] * alpha
            )
        return img

    def sequence(self, n_frames: int, fps: float = 20.0):
        for i in range(n_frames):
            t = i / fps
            Tcw = self.pose(t)
            yield t, Tcw, self.render(Tcw)
