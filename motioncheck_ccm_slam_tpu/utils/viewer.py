"""Viewer-lite: map / trajectory rendering to image files.

Replaces the reference's RViz marker publisher (src/Viewer.cpp — KF frusta,
per-client colored trajectories, covisibility edges, landmark cloud) with
matplotlib exports; the same per-client color table is used
(reference conf/config.yaml:133-176 color blocks).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

CLIENT_COLORS = ["#d62728", "#1f77b4", "#2ca02c", "#9467bd"]  # 4 agents


def render_map(m, path: str, title: str = "map",
               show_covis: bool = False) -> None:
    """Top-down (x-z) render of a MapState: landmarks + per-client keyframe
    trajectories."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..models import map_state as ms

    fig, ax = plt.subplots(figsize=(9, 6))
    mp_valid = np.asarray(m.mp.valid)
    X = np.asarray(m.mp.Xw)[mp_valid]
    if len(X):
        ax.scatter(X[:, 0], X[:, 2], s=1, c="#999999", alpha=0.5,
                   label=f"{len(X)} landmarks")
    kf_valid = np.asarray(m.kf.valid)
    cids = np.asarray(m.kf.client_id)
    ts = np.asarray(m.kf.timestamp)
    for cid in np.unique(cids[kf_valid]):
        sel = kf_valid & (cids == cid)
        T = np.asarray(m.kf.Tcw)[sel]
        order = np.argsort(ts[sel])
        C = np.stack([np.linalg.inv(t)[:3, 3] for t in T])[order]
        color = CLIENT_COLORS[int(cid) % len(CLIENT_COLORS)]
        ax.plot(C[:, 0], C[:, 2], "o-", ms=3, color=color,
                label=f"agent {cid} ({sel.sum()} KFs)")
    if show_covis:
        W = np.asarray(ms.covisibility(m.kf, m.nm))
        idx = np.argwhere(np.triu(W, 1) >= 15)
        Tall = np.asarray(m.kf.Tcw)
        for a, b in idx:
            if kf_valid[a] and kf_valid[b]:
                Ca = np.linalg.inv(Tall[a])[:3, 3]
                Cb = np.linalg.inv(Tall[b])[:3, 3]
                ax.plot([Ca[0], Cb[0]], [Ca[2], Cb[2]], "-",
                        color="#cccccc", lw=0.3, zorder=0)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_title(title)
    ax.legend(loc="best", fontsize=8)
    ax.set_aspect("equal", adjustable="datalim")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def render_trajectories(trajs: Dict[int, np.ndarray], path: str,
                        gt: Optional[np.ndarray] = None,
                        title: str = "trajectories") -> None:
    """Plot per-agent camera-center tracks (N, 3) plus optional GT."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 6))
    if gt is not None:
        ax.plot(gt[:, 0], gt[:, 2], "k--", lw=1, label="ground truth")
    for cid, C in trajs.items():
        color = CLIENT_COLORS[int(cid) % len(CLIENT_COLORS)]
        ax.plot(C[:, 0], C[:, 2], "-", color=color, label=f"agent {cid}")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_title(title)
    ax.legend(fontsize=8)
    ax.set_aspect("equal", adjustable="datalim")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
