"""EuRoC-scale accuracy benchmark on the full product path.

Mirrors the experiment shape of the reference's headline evaluation
(/root/reference/readme.md:12: multi-agent EuRoC MH01-03, ATE + Motion
Check deltas) on the synthetic corridor-loop world, since the dataset is
not present in this image:

- N agents (default 3) each fly >=500 frames around the SAME ring world,
  started at staggered angles -> pairwise overlap drives cross-map matches
  and CASCADED merges (A+B -> AB, then AB+C);
- each agent's own revolution organically revisits its start -> intra-map
  loop closures through the full chain (BoW detect -> Sim3 -> correction ->
  essential graph -> Motion-Check-gated GBA), GBA-after-loop ON;
- a second pass runs with the Motion Check disabled -> the MC delta.

Writes BENCH_accuracy.json at the repo root. For the real-dataset run once
EuRoC is available:
    python -m motioncheck_ccm_slam_tpu.cli euroc --seq <dir>/MH_01_easy --out /tmp/mh01

Usage: python tools/bench_accuracy.py [--agents 3] [--frames 520]
       [--small] [--skip-mc-off]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_pass(agents, frames, out, small, motion_check):
    from motioncheck_ccm_slam_tpu.cli import cmd_synth

    ns = argparse.Namespace(
        agents=agents, frames=frames, out=out, small=small,
        shared_world=True, blackout=None, live=None,
        save_map=None, load_map=None, world="ring", arc_offset_deg=None,
        motion_check=motion_check,
    )
    t0 = time.time()
    stats = cmd_synth(ns)
    stats["wall_s"] = round(time.time() - t0, 1)
    return stats


def summarize(stats):
    ates = [a.get("ate_rmse_m") for a in stats["agents"].values()
            if a.get("ate_rmse_m") is not None]
    maxes = [a.get("ate_max_m") for a in stats["agents"].values()
             if a.get("ate_max_m") is not None]
    return {
        "ate_rmse_m_per_agent": {k: a.get("ate_rmse_m")
                                 for k, a in stats["agents"].items()},
        "ate_rmse_m_mean": round(sum(ates) / len(ates), 4) if ates else None,
        "ate_max_m_worst": round(max(maxes), 4) if maxes else None,
        "n_merges": stats["n_merges"],
        "loops_closed": sum(m["loops"] for m in stats["server_maps"]),
        "regba": sum(m.get("regba", 0) for m in stats["server_maps"]),
        "server_kfs": sum(m["kfs"] for m in stats["server_maps"]),
        "server_mps": sum(m["mps"] for m in stats["server_maps"]),
        "n_maps_final": len(stats["server_maps"]),
        "states": [a["state"] for a in stats["agents"].values()],
        "wall_s": stats["wall_s"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=3)
    ap.add_argument("--frames", type=int, default=520)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--skip-mc-off", action="store_true",
                    help="skip the Motion-Check-disabled comparison pass")
    ap.add_argument("--merge", action="store_true",
                    help="assemble BENCH_accuracy.json from existing "
                         "<out>/mc_on/stats.json + <out>/mc_off/stats.json "
                         "(the two passes can be run as concurrent "
                         "processes — the run is host/tunnel-latency "
                         "bound, not chip bound)")
    ap.add_argument("--out", default="/tmp/bench_accuracy")
    args = ap.parse_args()

    if args.merge:
        result = {
            "metric": "ring_multi_agent_accuracy",
            "agents": args.agents,
            "frames_per_agent": args.frames,
            "preset": "small" if args.small else "full",
        }
        for leg in ("mc_on", "mc_off"):
            p = os.path.join(args.out, leg, "stats.json")
            if os.path.exists(p):
                with open(p) as f:
                    result[leg] = summarize(json.load(f))
        if "mc_on" not in result:
            raise SystemExit("no mc_on stats to merge")
        on = result["mc_on"]["ate_rmse_m_mean"]
        off = result.get("mc_off", {}).get("ate_rmse_m_mean")
        if on is not None and off is not None:
            result["mc_delta_rmse_m"] = round(off - on, 4)
        path = os.path.join(ROOT, "BENCH_accuracy.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result, indent=2))
        print(f"wrote {path}")
        return

    result = {
        "metric": "ring_multi_agent_accuracy",
        "agents": args.agents,
        "frames_per_agent": args.frames,
        "preset": "small" if args.small else "full",
        "mc_on": summarize(run_pass(
            args.agents, args.frames, os.path.join(args.out, "mc_on"),
            args.small, True)),
    }
    if not args.skip_mc_off:
        result["mc_off"] = summarize(run_pass(
            args.agents, args.frames, os.path.join(args.out, "mc_off"),
            args.small, False))
        on = result["mc_on"]["ate_rmse_m_mean"]
        off = result["mc_off"]["ate_rmse_m_mean"]
        if on is not None and off is not None:
            result["mc_delta_rmse_m"] = round(off - on, 4)

    path = os.path.join(ROOT, "BENCH_accuracy.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
