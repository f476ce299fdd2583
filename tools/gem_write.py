#!/usr/bin/env python3
"""Write a GEM1 model file from Python — the non-JVM half of the
cross-language model-bridge contract (ExternalModelEncoder.scala).

A user's training script exports token-featurized dense layers
(a distilled MiniLM-class text tower) with:

    python3 tools/gem_write.py out.gem --npz weights.npz \
        --featdim 4096 --seed 12345

where weights.npz holds row-major float arrays W0 (out0 x featdim),
b0 (out0), W1 (out1 x out0), b1, ... and per-layer activations ride
--acts none,relu,...,none (default: relu between, none last).

`--demo` writes a small deterministic 3-layer model whose every weight
is integer-formula-derived ((i*31 + j*17) % 97 - 48) / 64 — the same
closed form GemContractSpec recomputes on the JVM side, so the
round-trip proves BIT parity of the format across writers, not just
shape agreement.

GEM1 layout (all big-endian):
    magic   b"GEM1"
    featDim int32       hashed bag-of-tokens width (FNV-1a 64 + seed)
    seed    int64
    nLayers int32
    per layer: outDim int32, inDim int32, act uint8 (0 none/1 relu/2 tanh),
               weights outDim*inDim float64 (row-major), bias outDim float64
"""
import argparse
import struct
import sys

ACTS = {"none": 0, "relu": 1, "tanh": 2}


def write_gem(path, featdim, seed, layers):
    """layers: list of (act:int, W:list[list[float]], b:list[float])."""
    with open(path, "wb") as f:
        f.write(b"GEM1")
        f.write(struct.pack(">i", featdim))
        f.write(struct.pack(">q", seed))
        f.write(struct.pack(">i", len(layers)))
        for act, w, b in layers:
            out_dim, in_dim = len(w), len(w[0])
            if len(b) != out_dim:
                raise SystemExit(f"bias length {len(b)} != outDim {out_dim}")
            f.write(struct.pack(">iib", out_dim, in_dim, act))
            for row in w:
                if len(row) != in_dim:
                    raise SystemExit("ragged weight matrix")
                f.write(struct.pack(f">{in_dim}d", *row))
            f.write(struct.pack(f">{out_dim}d", *b))


def demo_layers(dims):
    """Deterministic integer-formula weights — exact in every IEEE-754
    implementation, so the JVM side recomputes them bit-identically."""
    layers = []
    for li in range(len(dims) - 1):
        in_dim, out_dim = dims[li], dims[li + 1]
        w = [[((i * 31 + j * 17 + li * 7) % 97 - 48) / 64.0
              for j in range(in_dim)] for i in range(out_dim)]
        b = [((i * 13 + li * 5) % 41 - 20) / 64.0 for i in range(out_dim)]
        act = 0 if li == len(dims) - 2 else 1  # relu between, none last
        layers.append((act, w, b))
    return layers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--featdim", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--demo", action="store_true",
                    help="write the deterministic formula model")
    ap.add_argument("--dims", default="64,32,16",
                    help="demo layer widths featdim,hidden...,out")
    ap.add_argument("--npz", help="numpy archive with W0,b0,W1,b1,...")
    ap.add_argument("--acts", help="comma list per layer (none/relu/tanh)")
    args = ap.parse_args()

    if args.demo:
        dims = [int(d) for d in args.dims.split(",")]
        if dims[0] != args.featdim:
            raise SystemExit("--dims must start at --featdim")
        write_gem(args.out, args.featdim, args.seed, demo_layers(dims))
        return
    if not args.npz:
        raise SystemExit("need --demo or --npz")
    import numpy as np  # only the npz path needs it
    z = np.load(args.npz)
    n = len([k for k in z.files if k.startswith("W")])
    acts = (args.acts.split(",") if args.acts
            else ["relu"] * (n - 1) + ["none"])
    if len(acts) != n:
        raise SystemExit(f"--acts must name {n} activations")
    layers = []
    for li in range(n):
        w = np.asarray(z[f"W{li}"], dtype=np.float64)
        b = np.asarray(z[f"b{li}"], dtype=np.float64)
        layers.append((ACTS[acts[li]], w.tolist(), b.tolist()))
    write_gem(args.out, args.featdim, args.seed, layers)


if __name__ == "__main__":
    main()
