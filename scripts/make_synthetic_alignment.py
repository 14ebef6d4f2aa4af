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
    ap.add_argument("--treeOut", default=None,
                    help="also write the true genealogy as newick; switches "
                    "to a leaf-sampled split process so every sample is a "
                    "leaf of the truth tree (accuracy benchmarking, like the "
                    "reference's phastSim-along-a-tree setup, "
                    "scripts/MAPLE_benchmarking.py:9-85)")
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

    if args.treeOut:
        _generate_with_tree(args, rng, ref, lRef, nucs, ambs)
        return

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


def _generate_with_tree(args, rng, ref, lRef, nucs, ambs):
    """Leaf-sampled variant: a split (birth) process where only the final
    lineages become samples, so the genealogy is a proper binary tree with
    all samples at the leaves.  Writes the truth newick (branch lengths =
    #substitutions/lRef) alongside the MAPLE alignment, for RF-to-truth
    accuracy benchmarking (VERDICT r1 item 6; the analogue of the
    reference's simulate-along-a-known-tree harness)."""
    import gzip

    def mutate(g, lam):
        n = 0
        for _ in range(_poisson(rng, lam)):
            pos = rng.randrange(1, lRef + 1)
            cur = g.get(pos, ref[pos - 1])
            alt = rng.choice([c for c in nucs if c != cur])
            if alt == ref[pos - 1]:
                g.pop(pos, None)
            else:
                g[pos] = alt
            n += 1
        return n

    # tree arrays; node 0 is the root
    children = [[]]
    nmut = [0]          # substitutions on the edge above each node
    genomes = {0: {}}   # genomes only kept for active lineages
    active = [0]
    while len(active) < args.samples:
        # split a random active lineage, biased toward recent ones so the
        # "pandemic" has expanding clades (same bias as the default mode)
        i = int(len(active) * (1 - rng.random() ** 2.5)) % len(active)
        parent = active[i]
        g = genomes.pop(parent)
        kids = []
        for k in range(2):
            child_g = g if k else dict(g)
            node = len(children)
            children.append([])
            nmut.append(mutate(child_g, args.mutRate))
            genomes[node] = child_g
            children[parent].append(node)
            kids.append(node)
        active[i] = kids[0]
        active.append(kids[1])

    # leaf naming in active order = sample order in the alignment
    leaf_name = {}
    for s, node in enumerate(active):
        leaf_name[node] = f"S{s}"

    # iterative newick writer (biased splits make deep chains; no recursion)
    parts = []
    stack = [(0, 0)]
    while stack:
        node, state = stack.pop()
        if not children[node]:
            parts.append(f"{leaf_name[node]}:{nmut[node] / lRef:.10f}")
            continue
        if state == 0:
            parts.append("(")
            stack.append((node, 1))
            stack.append((children[node][0], 0))
        elif state == 1:
            parts.append(",")
            stack.append((node, 2))
            stack.append((children[node][1], 0))
        else:
            parts.append(f"):{nmut[node] / lRef:.10f}")
    with open(args.treeOut, "w") as f:
        f.write("".join(parts) + ";\n")

    opener = gzip.open if args.output.endswith(".gz") else open
    with opener(args.output, "wt") as out:
        out.write(">reference\n")
        for i in range(0, lRef, 80):
            out.write(ref[i:i + 80] + "\n")
        for node in active:
            g = genomes[node]
            obs = dict(g)
            for _ in range(_poisson(rng, args.ambRate)):
                obs[rng.randrange(1, lRef + 1)] = rng.choice(ambs)
            n_runs = []
            for _ in range(_poisson(rng, args.nRate)):
                start = rng.randrange(1, lRef + 1)
                n_runs.append((start, min(rng.randrange(1, 200),
                                          lRef - start + 1)))
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
            out.write(f">{leaf_name[node]}\n")
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
