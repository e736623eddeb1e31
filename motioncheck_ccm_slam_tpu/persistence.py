"""Map checkpoint save/load.

Replaces the reference's cereal-based persistence (``Map::SaveMap`` /
``LoadMap`` src/Map.cpp:347-634, per-entity binary files + pointer
reconstruction): the SoA map state serializes to a single compressed npz
(device blocks) plus the host allocator index, with no pointer fixup needed —
slot indices are stable across save/load.

Triggered by the server API (the reference exposed it as the
``ccmslam_savemap`` ROS service, src/server/ServerSystem.cpp:36).
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .config import Config
from .models import map_state as ms


def save_map(m: ms.MapState, path: str) -> None:
    """Write the full map state to ``path`` (.npz) + ``path``.index.json."""
    arrays = {}
    for name, arr in m.kf._asdict().items():
        arrays[f"kf_{name}"] = np.asarray(arr)
    for name, arr in m.mp._asdict().items():
        arrays[f"mp_{name}"] = np.asarray(arr)
    np.savez_compressed(path, **arrays)
    index = {
        "next_kf_slot": m.next_kf_slot,
        "next_mp_slot": m.next_mp_slot,
        "kf_slots": [
            [int(k[0]), int(k[1]), int(v)] for k, v in m.kf_slot_by_id.items()
        ],
        "mp_slots": [
            [int(k[0]), int(k[1]), int(v)] for k, v in m.mp_slot_by_id.items()
        ],
    }
    with open(path + ".index.json", "w") as f:
        json.dump(index, f)


def load_map(path: str, config: Config) -> ms.MapState:
    """Rebuild a MapState from a checkpoint. Capacities come from the file
    (they may differ from the config's current capacities)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    kf_fields = {
        k[3:]: jnp.asarray(v) for k, v in data.items() if k.startswith("kf_")
    }
    mp_fields = {
        k[3:]: jnp.asarray(v) for k, v in data.items() if k.startswith("mp_")
    }
    m = ms.MapState(
        kf=ms.KFBlock(**kf_fields), mp=ms.MPBlock(**mp_fields), config=config
    )
    idx_path = (path if path.endswith(".index.json")
                else (path + ".index.json" if os.path.exists(path + ".index.json")
                      else os.path.splitext(path)[0] + ".npz.index.json"))
    if os.path.exists(idx_path):
        with open(idx_path) as f:
            index = json.load(f)
        m.next_kf_slot = index["next_kf_slot"]
        m.next_mp_slot = index["next_mp_slot"]
        m.kf_slot_by_id = {(a, b): c for a, b, c in index["kf_slots"]}
        m.mp_slot_by_id = {(a, b): c for a, b, c in index["mp_slots"]}
    else:
        m.sync_host_index()
    return m
