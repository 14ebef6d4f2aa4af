#!/usr/bin/env python3
"""Mask error-prone positions out of a MAPLE-format alignment.

Same CLI and output as the reference scripts/maskMapleFile.py (266
lines): masked sites from a VCF (FILTER == "mask") plus everything
outside [--minimumPos, --maximumPos] are replaced with 'n' runs; with
--reduceAlignment the masked columns are dropped from the output
coordinates entirely.

Masked regions merge with overlapping sample entries into single 'n'
runs using the reference's exact run-splitting rules, so outputs are
byte-identical.
"""
import argparse
import os
import sys
import time


def read_masks(mask_file, minimum_pos, maximum_pos):
    masks = []
    if minimum_pos > 1:
        masks.append((1, minimum_pos - 1))
    with open(mask_file) as f:
        line = f.readline()
        last = line
        while line[0] == "#":
            last = line
            line = f.readline()
        header = last.split()
        try:
            pos_i = header.index("POS")
            filter_i = header.index("FILTER")
        except ValueError:
            print(last)
            print("error, not found column POS/FILTER in the input VCF "
                  "masking file. Please follow the format in "
                  "https://github.com/W-L/ProblematicSites_SARS-CoV2/"
                  "blob/master/problematic_sites_sarsCov2.vcf ")
            sys.exit()
        while line != "" and line[0] != "\n":
            parts = line.split()
            pos = int(parts[pos_i])
            if parts[filter_i] == "mask" \
                    and minimum_pos <= pos <= maximum_pos:
                masks.append((pos, pos))
            line = f.readline()
    return masks


def mask_sample(entries, masks, out, reduce_alignment):
    """Mask one sample's diff entries, writing output lines; the control
    flow mirrors the reference's streaming merge (maskMapleFile.py:120-
    215) to reproduce its exact 'n'-run splitting."""
    pos = 0
    i_mask = 0
    last_mask = 0
    cum_masked = 0
    idx = 0
    while idx < len(entries):
        entry = entries[idx]
        consumed = True
        if reduce_alignment:
            if entry[1] > pos:
                pos = entry[1]
        else:
            pos = entry[1]
        duration = 1
        if len(entry) > 2:
            duration = entry[2]
        last_pos = entry[1] + duration - 1
        if reduce_alignment and len(entry) > 2:
            duration = entry[2] + (entry[1] - pos)

        while masks[i_mask][1] < pos or masks[i_mask][0] < last_mask:
            if masks[i_mask][1] > last_mask:
                first = max(last_mask + 1, masks[i_mask][0])
                last_mask = masks[i_mask][1]
                if reduce_alignment:
                    cum_masked += last_mask + 1 - first
                else:
                    out.write(f"n\t{first}\t{last_mask + 1 - first}\n")
            i_mask += 1

        if last_pos > last_mask:
            if pos < masks[i_mask][0]:
                if last_pos < masks[i_mask][0]:
                    if pos > last_mask:
                        # entry untouched by any mask
                        if len(entry) == 2:
                            if reduce_alignment:
                                out.write(f"{entry[0]}\t"
                                          f"{entry[1] - cum_masked}\n")
                            else:
                                out.write(f"{entry[0]}\t{entry[1]}\n")
                        else:
                            if reduce_alignment:
                                out.write(f"{entry[0]}\t"
                                          f"{pos - cum_masked}\t"
                                          f"{duration}\n")
                            else:
                                out.write(f"{entry[0]}\t{entry[1]}\t"
                                          f"{entry[2]}\n")
                    else:
                        # entry starts inside the already-masked region
                        if reduce_alignment:
                            first_print = last_mask + 1 - cum_masked
                            if 1 + last_pos - first_print > 0:
                                out.write(f"{entry[0]}\t{first_print}\t"
                                          f"{1 + last_pos - first_print}\n")
                        else:
                            first = last_mask + 1
                            last_mask = last_pos
                            out.write(f"n\t{first}\t"
                                      f"{last_mask + 1 - first}\n")
                else:
                    # entry overlaps the next mask
                    if reduce_alignment:
                        if pos > last_mask:
                            first_print = pos - cum_masked
                        else:
                            first_print = last_mask + 1 - cum_masked
                        while masks[i_mask][1] < last_pos:
                            cum_masked += (masks[i_mask][1] + 1
                                           - masks[i_mask][0])
                            last_mask = masks[i_mask][1]
                            i_mask += 1
                        if masks[i_mask][0] <= last_pos:
                            last_mask = masks[i_mask][1]
                            cum_masked += last_pos + 1 - masks[i_mask][0]
                        out.write(f"n\t{first_print}\t"
                                  f"{last_pos + 1 - (cum_masked + first_print)}\n")
                        if masks[i_mask][0] <= last_pos:
                            cum_masked += masks[i_mask][1] - last_pos
                            i_mask += 1
                    else:
                        first = min(pos, masks[i_mask][0])
                        first = max(first, last_mask + 1)
                        last_mask = max(masks[i_mask][1], last_pos)
                        out.write(f"n\t{first}\t{last_mask + 1 - first}\n")
                        i_mask += 1
            else:
                # entry begins at/after the mask start
                first = max(masks[i_mask][0], last_mask + 1)
                if reduce_alignment:
                    cum_masked += masks[i_mask][1] + 1 - first
                    last_mask = masks[i_mask][1]
                    consumed = False
                    pos = last_mask + 1
                else:
                    last_mask = max(masks[i_mask][1], last_pos)
                    out.write(f"n\t{first}\t{last_mask + 1 - first}\n")
                i_mask += 1
        if consumed:
            idx += 1
    return i_mask, last_mask, cum_masked


def main():
    parser = argparse.ArgumentParser(
        description="Mask a MAPLE alignment file.")
    parser.add_argument("--maskFile",
                        default="problematic_sites_sarsCov2.vcf")
    parser.add_argument("--minimumPos", type=int, default=1)
    parser.add_argument("--maximumPos", type=int, default=float("inf"))
    parser.add_argument("--input", default="")
    parser.add_argument("--output", default="")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--reduceAlignment", action="store_true")
    args = parser.parse_args()

    if not os.path.isfile(args.maskFile):
        print(f"ERROR {args.maskFile} does not exist.")
        sys.exit()
    if not os.path.isfile(args.input):
        print(f"ERROR input maple alignment file {args.input} not found.")
        sys.exit()
    if os.path.isfile(args.output) and not args.overwrite:
        print(f"ERROR file {args.output} already exists; use --overwrite.")
        sys.exit()

    start = time.time()
    masks = read_masks(args.maskFile, args.minimumPos, args.maximumPos)

    with open(args.input) as fin, open(args.output, "w") as out:
        line = fin.readline()
        out.write(line)
        line = fin.readline()
        ref = ""
        while line != "" and line[0] != ">":
            ref += line.replace("\n", "")
            line = fin.readline()
        ref = ref.lower()
        l_ref = len(ref)
        if l_ref > args.maximumPos:
            masks.append((args.maximumPos + 1, l_ref))
        masks.append((l_ref + 1, l_ref + 1))

        if args.reduceAlignment:
            pos = 1
            new_ref = ""
            for mask in masks:
                if mask[0] > pos and pos <= l_ref:
                    new_ref += ref[pos - 1:mask[0] - 1]
                    pos = mask[1] + 1
                else:
                    if mask[1] + 1 > pos:
                        pos = mask[1] + 1
            if pos <= l_ref:
                new_ref += ref[pos - 1:]
            out.write(new_ref + "\n")
        else:
            out.write(ref + "\n")

        n_seqs = 0
        while line != "" and line != "\n":
            out.write(line)
            line = fin.readline()
            entries = []
            while line != "" and line != "\n" and line[0] != ">":
                parts = line.split()
                if len(parts) < 2:
                    print(f"In input file {args.input} found line with "
                          f"only one column: \n{line}ERROR Please check "
                          "for errors in the alignment format.")
                    raise Exception("exit")
                if len(parts) > 2:
                    e = (parts[0].lower(), int(parts[1]), int(parts[2]))
                else:
                    e = (parts[0].lower(), int(parts[1]))
                if ref[e[1] - 1] == e[0] and e[0] != "n" and e[0] != "-":
                    print("Mutation observed into reference nucleotide at "
                          f"position {e[1]} , nucleotide {e[0]}. Wrong "
                          "reference and/or diff file?")
                    raise Exception("exit")
                entries.append(e)
                line = fin.readline()
            i_mask, last_mask, cum_masked = mask_sample(
                entries, masks, out, args.reduceAlignment)
            while masks[i_mask][1] <= l_ref:
                if masks[i_mask][1] > last_mask:
                    first = max(masks[i_mask][0], last_mask + 1)
                    last_mask = masks[i_mask][1]
                    if args.reduceAlignment:
                        cum_masked += last_mask + 1 - first
                    else:
                        out.write(f"n\t{first}\t{last_mask + 1 - first}\n")
                i_mask += 1
            n_seqs += 1

    print("Time to mask maple file: " + str(time.time() - start))
    print(str(n_seqs) + " sequences masked.")


if __name__ == "__main__":
    main()
