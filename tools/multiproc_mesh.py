"""True multi-controller mesh GBA: 2 jax.distributed CPU processes x 4
virtual devices each drive the product tile-stream solver
(parallel.sharded_ba.make_tile_gba) over one 8-device global mesh, and the
result is checked against the single-process solve of the same problem.

This is the process-boundary half of BASELINE.md's "2-host GBA" north star
that no previous round had executed: collectives (psums of the camera-side
accumulators and per-sweep (C,6) reductions) ride gloo across the process
boundary instead of intra-process ICI.

Usage:
    python tools/multiproc_mesh.py              # launcher: baseline + 2 procs
    python tools/multiproc_mesh.py --proc I     # internal: worker process I

Prints PASS/FAIL parity lines; exits nonzero on failure.
"""
import argparse
import json
import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

C, L, OBS_PER_KF, ITERS, PCG = 256, 8192, 256, 10, 20
COORD = "127.0.0.1:29772"
N_PROC, DEV_PER_PROC = 2, 4


def build_problem():
    import jax.numpy as jnp
    import numpy as np

    from motioncheck_ccm_slam_tpu.solvers import ba_core

    rng = np.random.default_rng(7)
    O = C * OBS_PER_KF
    pts = rng.uniform(-8, 8, (L, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 4.0
    Tcw = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    Tcw[:, 0, 3] = rng.uniform(-0.5, 0.5, C)
    Tcw[:, 1, 3] = rng.uniform(-0.5, 0.5, C)
    fx = fy = 458.0
    cx, cy = 376.0, 240.0
    K = jnp.asarray(np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                             np.float32))
    cam_idx = np.repeat(np.arange(C), OBS_PER_KF).astype(np.int32)
    lm_idx = rng.integers(0, L, O).astype(np.int32)
    pc = np.einsum("oij,oj->oi", Tcw[cam_idx][:, :3, :3], pts[lm_idx]) \
        + Tcw[cam_idx][:, :3, 3]
    z = np.maximum(pc[:, 2], 1e-3)
    uv = np.stack([fx * pc[:, 0] / z + cx, fy * pc[:, 1] / z + cy], -1)
    uv = (uv + rng.normal(0, 0.5, uv.shape)).astype(np.float32)
    obs = ba_core.BAObservations(
        cam_idx=jnp.asarray(cam_idx), lm_idx=jnp.asarray(lm_idx),
        uv=jnp.asarray(uv), inv_sigma2=jnp.ones(O, jnp.float32),
        valid=jnp.ones(O, bool),
    )
    fixed_cam = jnp.zeros(C, bool).at[0].set(True)
    fixed_lm = jnp.zeros(L, bool)
    return (jnp.asarray(Tcw), jnp.asarray(pts), obs, K, fixed_cam,
            fixed_lm)


def worker(proc_id: int):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=COORD,
                               num_processes=N_PROC, process_id=proc_id)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding

    from motioncheck_ccm_slam_tpu.parallel import sharded_ba

    assert len(jax.devices()) == N_PROC * DEV_PER_PROC
    mesh = Mesh(np.array(jax.devices()), (sharded_ba.AXIS,))

    def globalize(x, spec):
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    args = build_problem()
    gba = sharded_ba.make_tile_gba(mesh, pcg_iters=PCG,
                                   globalize=globalize)
    res = gba(*args, n_iterations=ITERS)
    out = {
        "cost": float(res.cost),
        "pose_checksum": float(jax.numpy.sum(jax.numpy.abs(res.Tcw))),
        "xw_checksum": float(jax.numpy.sum(jax.numpy.abs(res.Xw))),
        "n_inlier": int(jax.numpy.sum(res.obs_inlier)),
        "n_global_devices": len(jax.devices()),
        "n_local_devices": len(jax.local_devices()),
    }
    if proc_id == 0:
        with open("/tmp/multiproc_mesh_result.json", "w") as f:
            json.dump(out, f)
    print(f"proc {proc_id}: {out}", flush=True)


def launcher():
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from motioncheck_ccm_slam_tpu.parallel import sharded_ba

    # baseline: same problem, single-process (single-device tile solver)
    args = build_problem()
    gba = sharded_ba.make_tile_gba(None, pcg_iters=PCG)
    res = gba(*args, n_iterations=ITERS)
    base = {
        "cost": float(res.cost),
        "pose_checksum": float(jax.numpy.sum(jax.numpy.abs(res.Tcw))),
        "xw_checksum": float(jax.numpy.sum(jax.numpy.abs(res.Xw))),
        "n_inlier": int(jax.numpy.sum(res.obs_inlier)),
    }
    print(f"single-process baseline: {base}", flush=True)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--proc", str(i)],
        env=env, cwd=REPO) for i in range(N_PROC)]
    rcs = [p.wait(timeout=900) for p in procs]
    if any(rcs):
        print(f"FAIL: worker exit codes {rcs}")
        sys.exit(1)
    with open("/tmp/multiproc_mesh_result.json") as f:
        got = json.load(f)
    ok = True
    # checksums are sums of |x| over 1.5k-25k entries accumulated through
    # ITERS LM iterations: psum/reduction ordering noise compounds, so the
    # per-element agreement implied here is ~1e-6-1e-5. cost is the tight
    # invariant (observed bit-identical across the process boundary).
    for k, tol in (("cost", 2e-3), ("pose_checksum", 1e-3),
                   ("xw_checksum", 2e-3)):
        rel = abs(got[k] - base[k]) / max(abs(base[k]), 1e-9)
        line = (f"{k}: single={base[k]:.6g} multiproc={got[k]:.6g} "
                f"rel={rel:.2e} (tol {tol:g})")
        if rel > tol:
            ok = False
            line = "FAIL " + line
        print(line)
    if got["n_inlier"] != base["n_inlier"]:
        d = abs(got["n_inlier"] - base["n_inlier"])
        print(f"inliers: single={base['n_inlier']} "
              f"multiproc={got['n_inlier']} (delta {d})")
        ok = ok and d <= base["n_inlier"] * 1e-3
    print("PASS: multi-controller mesh matches single-process solve"
          if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    a = ap.parse_args()
    if a.proc is None:
        launcher()
    else:
        worker(a.proc)
