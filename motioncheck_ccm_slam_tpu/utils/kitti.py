"""KITTI odometry dataset reader (grayscale, cam0).

Replaces the reference's KITTI launch files
(/root/reference/cslam/launch/KITTI/Client0_kitti.launch,
cslam/conf/kitti_mono.yaml, kitti_mono_half_res.yaml): reads a
``sequences/NN`` directory (``image_0/%06d.png`` + ``times.txt``) and the
optional ``poses/NN.txt`` ground truth (3x4 row-major T_w_cam0 per frame)
for ATE evaluation.
"""
from __future__ import annotations

import glob
import os
from typing import Iterator, Optional, Tuple

import numpy as np


class KittiSequence:
    """One KITTI odometry sequence directory (e.g. ``.../sequences/00``)."""

    def __init__(self, root: str, poses: Optional[str] = None,
                 half_res: bool = False):
        self.root = root
        self.half_res = half_res
        self.img_dir = os.path.join(root, "image_0")
        times_path = os.path.join(root, "times.txt")
        if not os.path.isdir(self.img_dir):
            raise FileNotFoundError(self.img_dir)
        self.files = sorted(glob.glob(os.path.join(self.img_dir, "*.png")))
        if os.path.exists(times_path):
            self.times = np.loadtxt(times_path, np.float64).reshape(-1)
        else:
            # KITTI cam0 runs at 10 Hz
            self.times = np.arange(len(self.files), dtype=np.float64) * 0.1
        # ground truth: explicit path, or the standard ../../poses/NN.txt
        if poses is None:
            seq_name = os.path.basename(os.path.normpath(root))
            cand = os.path.join(os.path.dirname(os.path.dirname(
                os.path.normpath(root))), "poses", seq_name + ".txt")
            poses = cand if os.path.exists(cand) else None
        self.poses_path = poses

    def __len__(self) -> int:
        return len(self.files)

    def frames(self, start: int = 0, stop: Optional[int] = None,
               stride: int = 1) -> Iterator[Tuple[float, np.ndarray]]:
        """Yield (timestamp_s, grayscale f32 image)."""
        from PIL import Image

        for i in range(start, stop if stop is not None else len(self.files),
                       stride):
            if i >= len(self.files):
                break
            img = Image.open(self.files[i])
            if self.half_res:
                img = img.resize((img.width // 2, img.height // 2))
            arr = np.asarray(img, np.float32)
            if arr.ndim == 3:
                arr = arr.mean(-1)
            yield float(self.times[i]), arr

    def ground_truth(self) -> Optional[np.ndarray]:
        """(N, 3, 4) T_w_cam0 per frame, or None."""
        if self.poses_path is None or not os.path.exists(self.poses_path):
            return None
        flat = np.loadtxt(self.poses_path, np.float64)
        return flat.reshape(-1, 3, 4)

    def gt_positions_at(self, stamps) -> np.ndarray:
        """Ground-truth cam0 positions, interpolated at given stamps.

        KITTI ground truth is indexed by frame, not time; times.txt aligns
        frame index -> stamp, so interpolate each position channel over the
        per-frame timeline.
        """
        gt = self.ground_truth()
        if gt is None:
            raise RuntimeError("no ground-truth poses for sequence")
        n = min(len(gt), len(self.times))
        t = self.times[:n]
        pos = gt[:n, :3, 3]
        return np.stack(
            [np.interp(stamps, t, pos[:, i]) for i in range(3)], -1
        )
