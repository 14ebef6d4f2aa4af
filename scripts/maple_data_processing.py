#!/usr/bin/env python3
"""Viridian dataset preparation / QC for MAPLE alignments.

Equivalent of the reference scripts/MapleDataProcessing.py (431 lines),
which prepares Viridian SARS-CoV-2 assemblies for MAPLE: per-sample QC
summarization, contamination/low-coverage filtering, removal of short
deletion entries, and masking of recurrent-error sites.  The reference
hard-codes every path (``alignment.maple``, ``Vdn_all_ena/Reads/...``,
``QCsummary<i>.txt``); here each is a flag with the reference value as
default, so the same pipeline runs on any dataset.  All thresholds and
the output formats are identical to the reference:

* ``--summarizeQCfiles N --coreQC i`` (reference :80-174): scan the
  alignment's sample names, open each sample's Viridian ``qc.tsv.gz``
  and write ``QCsummary<i>.txt`` with coverage-state transition lines
  (``pos\\tcov<20|cov<100|cov>=100``) and the full QC rows of
  heterozygous positions (>=2 nucleotides with count>9 and
  frequency>0.05), at most 50 per sample.
* ``--analyseQCsummaryFiles`` (reference :179-268): aggregate the
  summaries, print heterozygosity/coverage histograms, and write
  ``alignment_filtered.maple`` without samples failing any of:
  >2 positions het>20%, >7 het>10%, >30 het>5%, >1500 positions cov<20,
  >2500 positions cov<100 (thresholds at reference :180-185).
* ``--removeOnlyShortCommonDeletions`` (reference :274-307): drop
  deletion entries with an explicit length field of 2..30 bases
  (single-position and >30-base deletions are kept).
* ``--maskAlignment`` (reference :313-385): remove diff entries at the
  recurrent-error positions of the built-in Viridian mask (single-base
  entries and length-1 N runs only).
"""
import argparse
import gzip
import os
import sys

# Recurrent-error positions masked from Viridian alignments
# (reference scripts/MapleDataProcessing.py:28-75).
MASKED_POSITIONS = [
    25202, 21987, 27507, 8835, 15521, 26766, 8008, 8012, 15510, 17259,
    19413, 22786, 22882, 23948, 8826, 8829, 15854, 19672, 21650, 23118,
    25296, 25324, 25336, 29687, 22026, 22027, 22028, 22029, 22030,
    22031, 22032, 22033, 22034, 22195, 22197, 22198, 22202, 22204, 274,
    4321, 26530, 28245, 28247, 28249, 28253, 28251, 28254,
]


def qc_file_candidates(reads_dir, name):
    """Viridian read-store paths for a sample's qc.tsv.gz
    (reference :104-116: ENA accessions sharded by prefix)."""
    base = os.path.join(reads_dir, name[0])
    if name[0] == "E":
        return [
            os.path.join(base, name[1:6], name[6:8], name[8:10],
                         "vdn.v1.0.0", "qc.tsv.gz"),
            os.path.join(base, name[1:7], name[7:9], name[9:11],
                         "vdn.v1.0.0", "qc.tsv.gz"),
        ]
    if name[0] == "S":
        return [os.path.join(base, name[1:7], name[7:9], name[9:11],
                             "vdn.v1.0.0", "qc.tsv.gz")]
    if name[0] == "D":
        return [os.path.join(base, name[1:5], name[5:7], name[7:9],
                             "vdn.v1.0.0", "qc.tsv.gz")]
    return []


def open_qc_file(reads_dir, name):
    for path in qc_file_candidates(reads_dir, name):
        try:
            return gzip.open(path, "rt")
        except OSError:
            continue
    return None


def summarize_qc_files(alignment, reads_dir, num_cores, core, out_path):
    """Write QCsummary<core>.txt for this core's share of the samples
    (reference :93-174)."""
    al_file = open(alignment)
    sample_num = 1
    al_file.readline()
    al_file.readline()
    line_al = al_file.readline()
    o_file = open(out_path, "w")
    while line_al != "" and line_al != "\n":
        if line_al[0] == ">":
            name = line_al[1:-1]
            if ((sample_num % num_cores) + 1) == core:
                qc = open_qc_file(reads_dir, name)
                if qc is None:
                    print(name)
                    line_al = al_file.readline()
                    continue
                o_file.write(line_al)
                qc.readline()
                line = qc.readline()
                cov_state = -1
                num_pos_printed = 0
                while line != "" and line != "\n":
                    fields = line.split()
                    pos = int(fields[0])
                    try:
                        cov = int(fields[9])
                    except (ValueError, IndexError):
                        cov = 0
                    if cov < 20:
                        new_cov_state = 0
                    elif cov < 100:
                        new_cov_state = 1
                    else:
                        new_cov_state = 2
                    if new_cov_state != cov_state:
                        names = ["cov<20", "cov<100", "cov>=100"]
                        o_file.write(f"{pos}\t{names[new_cov_state]}\n")
                        cov_state = new_cov_state
                    if new_cov_state:
                        # heterozygosity check: >=2 alleles with >9
                        # supporting reads at >5% frequency
                        # (reference :152-165)
                        num_nucs = 0
                        for i in range(4):
                            count = (int(fields[11 + 2 * i])
                                     + int(fields[12 + 2 * i]))
                            if count > 9 and count / cov > 0.05:
                                num_nucs += 1
                        if num_nucs > 1:
                            num_pos_printed += 1
                            o_file.write(line)
                        if num_pos_printed > 50:
                            break
                    line = qc.readline()
                qc.close()
            if (sample_num % 1000) == 0:
                print(sample_num)
            sample_num += 1
        line_al = al_file.readline()
    al_file.close()
    o_file.close()


def analyse_qc_summaries(alignment, summary_prefix, num_summary_files,
                         out_path, genome_length, masked_positions):
    """Aggregate QCsummary files, print het/coverage histograms, and
    write the filtered alignment (reference :179-268)."""
    threshold_freqs = [0.05, 0.1, 0.2]
    threshold_het_cov = [9, 19, 39]
    num_positions_thresholds = [1500, 2500]
    max_num_het = [30, 7, 2]
    barplot_het = [[0] * 52, [0] * 52, [0] * 52]
    barplot_cov = [[0] * 102, [0] * 102]
    filtered_out = {}
    num_masked_for_het = [0, 0, 0]
    num_masked_for_cov = [0, 0]
    masked = set(masked_positions)
    for i_file in range(num_summary_files):
        path = f"{summary_prefix}{i_file + 1}.txt"
        print("File " + path)
        try:
            file = open(path)
        except OSError:
            print(f"  missing, skipped")
            continue
        line = file.readline()
        while line != "" and line != "\n":
            num_het = [0, 0, 0]
            num_pos_below = [0, 0]
            current_pos = 1
            current_cov = 0
            name = line[1:-1]
            line = file.readline()
            while line != "" and line != "\n" and line[0] != ">":
                fields = line.split()
                pos = int(fields[0])
                if len(fields[1]) > 1:
                    # coverage-state transition line: account the span
                    # since the previous transition to the lower-coverage
                    # counters (cov<20 also counts toward cov<100,
                    # reference :212-224)
                    if current_cov < 2:
                        num_pos_below[current_cov] += pos - current_pos
                        if current_cov < 1:
                            num_pos_below[1] += pos - current_pos
                    if fields[1] == "cov<20":
                        current_cov = 0
                    elif fields[1] == "cov>=100":
                        current_cov = 2
                    else:
                        current_cov = 1
                    current_pos = pos
                else:
                    # full QC row of a heterozygous position
                    if current_cov and pos not in masked:
                        try:
                            cov = int(fields[9])
                        except (ValueError, IndexError):
                            cov = 0
                        if cov:
                            num_nucs = [0, 0, 0]
                            for i in range(4):
                                count = (int(fields[11 + 2 * i])
                                         + int(fields[12 + 2 * i]))
                                for j in range(len(threshold_freqs)):
                                    if count > threshold_het_cov[j] \
                                            and count / cov \
                                            > threshold_freqs[j]:
                                        num_nucs[j] += 1
                            for j in range(len(threshold_freqs)):
                                if num_nucs[j] > 1:
                                    num_het[j] += 1
                line = file.readline()
            if current_cov < 2:
                num_pos_below[current_cov] += genome_length - current_pos
            if num_het[0] > 50:
                barplot_het[0][51] += 1
                filtered_out[name] = True
            else:
                for j in range(len(threshold_freqs)):
                    barplot_het[j][num_het[j]] += 1
                    if num_het[j] > max_num_het[j]:
                        filtered_out[name] = True
                        num_masked_for_het[j] += 1
                for j in range(len(num_pos_below)):
                    if num_pos_below[j] > num_positions_thresholds[j]:
                        filtered_out[name] = True
                        num_masked_for_cov[j] += 1
                    barplot_cov[j][int(num_pos_below[j] / 300)] += 1
        file.close()
    print("barplots Het:")
    for j in range(len(threshold_freqs)):
        print(barplot_het[j])
    print("barplots Cov:")
    for j in range(len(barplot_cov)):
        print(barplot_cov[j])
    print("Number of samples removed for Het")
    print(num_masked_for_het)
    print("Number of samples removed for Cov")
    print(num_masked_for_cov)

    # write the filtered alignment (reference :246-267)
    file = open(alignment)
    file_o = open(out_path, "w")
    file_o.write(file.readline())
    file_o.write(file.readline())
    line = file.readline()
    while line != "" and line != "\n":
        name = line[1:-1]
        keep = name not in filtered_out
        if keep:
            file_o.write(line)
        line = file.readline()
        while line != "" and line != "\n" and line[0] != ">":
            if keep:
                file_o.write(line)
            line = file.readline()
    file.close()
    file_o.close()


def list_deletion_abundances(alignment):
    """Print the 1000 most common deletion entries (reference :277-296,
    the createSortedListOfDeletionAbundances branch)."""
    deletions = {}
    with open(alignment) as f:
        f.readline()
        f.readline()
        for line in f:
            if line == "\n":
                break
            if line[0] == "-":
                fields = line.split()
                if len(fields) > 2:
                    code = fields[1] + "+" + fields[2]
                else:
                    code = fields[1] + "+1"
                deletions[code] = deletions.get(code, 0) + 1
    print(sorted(deletions.items(), key=lambda item: item[1])[-1000:])


def remove_short_deletions(alignment, out_path):
    """Drop deletion entries with explicit length 2..30 (reference
    :299-307; deletions sparsely shared across samples create artificial
    ancestral mutations, per the reference comment at :272)."""
    file = open(alignment)
    file_o = open(out_path, "w")
    file_o.write(file.readline())
    file_o.write(file.readline())
    line = file.readline()
    while line != "" and line != "\n":
        if line[0] != "-":
            file_o.write(line)
        else:
            fields = line.split()
            if (len(fields) < 3) or (int(fields[2]) > 30):
                file_o.write(line)
        line = file.readline()
    file.close()
    file_o.close()


def mask_alignment(alignment, out_path, masked_positions):
    """Remove diff entries at recurrent-error positions (reference
    :318-385): substitutions/single bases at a masked position are
    dropped, and N/gap runs only when their length is exactly 1."""
    masked = set(masked_positions)
    file = open(alignment)
    file_o = open(out_path, "w")
    file_o.write(file.readline())
    file_o.write(file.readline())
    line = file.readline()
    while line != "" and line != "\n":
        if line[0] == ">":
            file_o.write(line)
        else:
            fields = line.split()
            pos = int(fields[1])
            if len(fields) == 3:
                if not (pos in masked and int(fields[2]) == 1):
                    file_o.write(line)
            else:
                if pos not in masked:
                    file_o.write(line)
        line = file.readline()
    file.close()
    file_o.close()


def read_masked_sites(path):
    with open(path) as f:
        return [int(tok) for line in f for tok in line.split()]


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Prepare Viridian genomes for running in MAPLE.")
    parser.add_argument("--maskAlignment", action="store_true",
                        help="Mask recurrent-error positions from the "
                             "alignment")
    parser.add_argument("--removeOnlyShortCommonDeletions",
                        action="store_true",
                        help="Remove short deletion entries from the "
                             "MAPLE alignment")
    parser.add_argument("--listDeletionAbundances", action="store_true",
                        help="Print the most common deletion entries "
                             "instead of filtering")
    parser.add_argument("--summarizeQCfiles", type=int, default=0,
                        help="Summarize Viridian QC files; value = "
                             "number of cores the task is split over")
    parser.add_argument("--coreQC", type=int, default=1,
                        help="1-based core index for --summarizeQCfiles")
    parser.add_argument("--analyseQCsummaryFiles", action="store_true",
                        help="Aggregate QC summaries and filter the "
                             "alignment")
    parser.add_argument("--alignment", default=None,
                        help="Input MAPLE alignment (default: the "
                             "reference's fixed name for the stage)")
    parser.add_argument("--output", default=None,
                        help="Output file (default: the reference's "
                             "fixed name for the stage)")
    parser.add_argument("--qcReadsDir", default="Vdn_all_ena/Reads",
                        help="Root of the Viridian read store holding "
                             "qc.tsv.gz files")
    parser.add_argument("--qcSummaryPrefix", default="QCsummary",
                        help="Prefix of QCsummary<i>.txt files")
    parser.add_argument("--numQCsummaryFiles", type=int, default=100,
                        help="Number of QCsummary files to aggregate")
    parser.add_argument("--genomeLength", type=int, default=29904,
                        help="Reference genome length for coverage "
                             "span accounting")
    parser.add_argument("--maskedSites", default=None,
                        help="File of positions to mask (default: "
                             "built-in Viridian recurrent-error list)")
    args = parser.parse_args(argv)

    masked = (read_masked_sites(args.maskedSites) if args.maskedSites
              else MASKED_POSITIONS)
    if args.summarizeQCfiles:
        summarize_qc_files(
            args.alignment or "alignment.maple", args.qcReadsDir,
            args.summarizeQCfiles, args.coreQC,
            args.output or f"{args.qcSummaryPrefix}{args.coreQC}.txt")
    elif args.analyseQCsummaryFiles:
        analyse_qc_summaries(
            args.alignment or "alignment.maple", args.qcSummaryPrefix,
            args.numQCsummaryFiles,
            args.output or "alignment_filtered.maple",
            args.genomeLength, masked)
    elif args.listDeletionAbundances:
        list_deletion_abundances(args.alignment
                                 or "alignment_filtered.maple")
    elif args.removeOnlyShortCommonDeletions:
        remove_short_deletions(
            args.alignment or "alignment_filtered.maple",
            args.output or "alignment_filtered_noShortDeletions.maple")
    elif args.maskAlignment:
        mask_alignment(
            args.alignment or "alignment_filtered_noShortDeletions.maple",
            args.output
            or "alignment_filtered_noShortDeletions_masked.maple",
            masked)
    else:
        parser.error("select a stage: --summarizeQCfiles, "
                     "--analyseQCsummaryFiles, "
                     "--removeOnlyShortCommonDeletions, "
                     "--maskAlignment")


if __name__ == "__main__":
    main()
