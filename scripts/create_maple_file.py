#!/usr/bin/env python3
"""Translate a fasta MSA into a MAPLE-format diff file.

Same CLI and output as the reference scripts/createMapleFile.py (182
lines): with --reference, differences are called against that genome;
otherwise the alignment consensus (ties broken A<C<G<T, all-gap columns
become 'n') is used.  Runs of 'n' and '-' are emitted as
``char\tpos\tlen`` lines, substitutions as ``char\tpos``.
"""
import argparse
import os
import sys
import time

ALLELES_LOW = {"a": 0, "c": 1, "g": 2, "t": 3}
ALLELES_LIST_LOW = ["a", "c", "g", "t"]


def collect_reference(path):
    with open(path) as f:
        f.readline()
        ref = "".join(line.strip() for line in f)
    print("Ref genome length: " + str(len(ref)))
    return ref.lower()


def iter_fasta(path):
    with open(path) as f:
        line = f.readline()
        while line != "":
            while line == "\n":
                line = f.readline()
            if line == "":
                return
            name = line.replace(">", "").replace("\n", "")
            seq = []
            line = f.readline()
            while line != "" and line != "\n" and line[0] != ">":
                seq.append(line.replace("\n", ""))
                line = f.readline()
            yield name, "".join(seq)


def extract_consensus(path):
    counts = None
    for name, seq in iter_fasta(path):
        seq = seq.lower()
        if counts is None:
            counts = [[0, 0, 0, 0] for _ in range(len(seq))]
        if len(seq) != len(counts):
            print(f"ERROR sequence of sample {name} has length {len(seq)} "
                  f"instead of {len(counts)} of the first sequence in the "
                  "file. Exiting create_maple_file.py .")
            sys.exit()
        for i, ch in enumerate(seq):
            if ch in ALLELES_LOW:
                counts[i][ALLELES_LOW[ch]] += 1
    consensus = []
    for i, c in enumerate(counts):
        max_i = 0
        max_v = 0
        for j in range(4):
            if c[j] > max_v:
                max_i = j
                max_v = c[j]
        if max_v > 0:
            consensus.append(ALLELES_LIST_LOW[max_i])
        else:
            print("WARNING no nucleotide observed at position " + str(i + 1)
                  + " of the alignment. Consensus is assigned as n, which "
                  "can create problems down the line if more sequence will "
                  "be analysed with the same reference.")
            consensus.append("n")
    return "".join(consensus)


def diff_entries(seq, ref):
    """Run-length diff of one (lower-cased) sequence against the
    reference; 'n' and '-' runs carry lengths."""
    out = []
    state = 0  # 0 = ref, 1 = inside n run, 2 = inside - run
    length = 0
    for i, ch in enumerate(seq):
        if state == 1 and ch != "n":
            out.append(("n", i + 1 - length, length))
            length = 0
            state = 0
        elif state == 2 and ch != "-":
            out.append(("-", i + 1 - length, length))
            length = 0
            state = 0
        if ch == "n":
            if state != 1:
                length = 0
                state = 1
            length += 1
        elif ch == "-":
            if state != 2:
                length = 0
                state = 2
            length += 1
        elif ch != ref[i]:
            out.append((ch, i + 1))
    if state == 1:
        out.append(("n", len(seq) + 1 - length, length))
    elif state == 2:
        out.append(("-", len(seq) + 1 - length, length))
    return out


def main():
    parser = argparse.ArgumentParser(
        description="Translate fasta alignment into a MAPLE file.")
    parser.add_argument("--path", default="",
                        help="path where to find and write files.")
    parser.add_argument("--reference", default="",
                        help="name of the reference sequence file within "
                             "the --path. By default creates a new "
                             "reference from the input alignment consensus.")
    parser.add_argument("--fasta", default="2021-03-31_unmasked.fa",
                        help="name of the input fasta alignment file.")
    parser.add_argument("--output",
                        default="2021-03-31_unmasked_differences.txt",
                        help="name of the output diff file.")
    parser.add_argument("--overwrite", action="store_true",
                        help="Overwrite previous MAPLE file with the same "
                             "output name if already present.")
    args = parser.parse_args()

    if args.path and not os.path.isdir(args.path):
        print(f"ERROR path {args.path} does not exist, quitting "
              "create_maple_file.py .")
        sys.exit()
    fasta = args.path + args.fasta
    if not os.path.isfile(fasta):
        print(f"ERROR input file in fasta format {fasta} not found.")
        sys.exit()
    out_path = args.path + args.output
    if os.path.isfile(out_path) and not args.overwrite:
        print(f"ERROR file {out_path} already exists; use --overwrite.")
        sys.exit()

    if args.reference:
        ref_path = args.path + args.reference
        if not os.path.isfile(ref_path):
            print(f"ERROR input reference fasta file {ref_path} not found.")
            sys.exit()
        ref = collect_reference(ref_path)
    else:
        ref = extract_consensus(fasta)

    start = time.time()
    n_seqs = 0
    with open(out_path, "w") as out:
        out.write(">reference\n" + ref + "\n")
        for name, seq in iter_fasta(fasta):
            n_seqs += 1
            out.write(">" + name + "\n")
            if len(seq) != len(ref):
                print(f"Seq {name} has length {len(seq)} while reference "
                      f"is {len(ref)}")
                sys.exit()
            for m in diff_entries(seq.lower(), ref):
                out.write("\t".join(str(x) for x in m) + "\n")
            if n_seqs % 10000 == 0:
                print(f"Processes {n_seqs} sequences")
    print("Time to convert alignment file: " + str(time.time() - start))
    print(str(n_seqs) + " sequences converted.")


if __name__ == "__main__":
    main()
