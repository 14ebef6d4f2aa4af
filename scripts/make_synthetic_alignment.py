#!/usr/bin/env python3
"""Generate a synthetic pandemic-scale MAPLE alignment for benchmarks.

Simulates low-divergence evolution the way the reference's benchmark
harness does with phastSim along a real tree
(scripts/MAPLE_benchmarking.py:9-85), but self-contained: genomes are
produced by a birth process — each new sample copies a randomly chosen
existing genome and adds Poisson-distributed new substitutions (plus
occasional ambiguity characters and N runs) — so the dataset has the
clustered, tree-like structure of real SARS-CoV-2 data rather than
independent noise.
"""
import argparse
import gzip
import random


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default=None,
                    help="fasta reference (default: built-in random 29903)")
    ap.add_argument("--samples", type=int, default=100000)
    ap.add_argument("--mutRate", type=float, default=1.5,
                    help="mean new substitutions per sample")
    ap.add_argument("--nRate", type=float, default=0.2,
                    help="mean N runs per sample")
    ap.add_argument("--ambRate", type=float, default=0.05,
                    help="mean ambiguity characters per sample")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    if args.reference:
        with open(args.reference) as f:
            f.readline()
            ref = "".join(line.strip() for line in f).lower()
    else:
        ref = "".join(rng.choice("acgt") for _ in range(29903))
    lRef = len(ref)
    nucs = "acgt"
    ambs = "yrwskm"

    # each genome = dict pos(1-based) -> char; the population grows by
    # copying a random earlier genome (preferring recent ones so the
    # "pandemic" has expanding clades)
    genomes = [{}]
    opener = gzip.open if args.output.endswith(".gz") else open
    with opener(args.output, "wt") as out:
        out.write(">reference\n")
        for i in range(0, lRef, 80):
            out.write(ref[i:i + 80] + "\n")
        for s in range(args.samples):
            # pick a parent biased toward recent genomes
            parent = genomes[int(len(genomes)
                                 * (1 - rng.random() ** 2.5))
                             % len(genomes)]
            g = dict(parent)
            for _ in range(_poisson(rng, args.mutRate)):
                pos = rng.randrange(1, lRef + 1)
                cur = g.get(pos, ref[pos - 1])
                alt = rng.choice([c for c in nucs if c != cur])
                if alt == ref[pos - 1]:
                    g.pop(pos, None)
                else:
                    g[pos] = alt
            genomes.append(g)
            # transient artifacts (not inherited): Ns and ambiguities
            obs = dict(g)
            for _ in range(_poisson(rng, args.ambRate)):
                obs[rng.randrange(1, lRef + 1)] = rng.choice(ambs)
            n_runs = []
            for _ in range(_poisson(rng, args.nRate)):
                start = rng.randrange(1, lRef + 1)
                n_runs.append((start, min(rng.randrange(1, 200),
                                          lRef - start + 1)))
            # merge non-overlapping N runs, drop substitutions they cover,
            # and emit everything sorted by position (MAPLE requires it)
            covered = []
            for start, length in sorted(n_runs):
                end = start + length - 1
                if covered and start <= covered[-1][1]:
                    covered[-1] = (covered[-1][0],
                                   max(covered[-1][1], end))
                else:
                    covered.append((start, end))
            lines = [(a, f"n\t{a}\t{b - a + 1}\n") for a, b in covered]
            ci = 0
            for pos in sorted(obs):
                while ci < len(covered) and covered[ci][1] < pos:
                    ci += 1
                if not (ci < len(covered) and covered[ci][0] <= pos):
                    lines.append((pos, f"{obs[pos]}\t{pos}\n"))
            lines.sort()
            out.write(f">S{s}\n")
            for _, line in lines:
                out.write(line)


def _poisson(rng, lam):
    # Knuth's algorithm; lam is small
    import math
    L = math.exp(-lam)
    k = 0
    p = 1.0
    while True:
        p *= rng.random()
        if p <= L:
            return k
        k += 1


if __name__ == "__main__":
    main()
