#!/usr/bin/env python3
"""Golden-file provenance driver: re-run the reference implementation for
every pinned configuration and diff (or refresh) the goldens.

Usage:
    python3 tests/regen_goldens.py --check            # fast tier (~45 min)
    python3 tests/regen_goldens.py --check --tier all # + b1429/b3000 (hours)
    python3 tests/regen_goldens.py --check --only sweep_fast example_gtr
    python3 tests/regen_goldens.py --update --only sweep_fast

Each registry entry records the exact reference command line
(/root/reference/MAPLEv0.7.5.4.py, CPython) that produced a golden
family, making the ~35 pinned parity files auditable and regenerable
after a reference-version bump.  Entries with source="self" are
regression pins of THIS implementation for configurations the reference
cannot produce (documented deviations; see notes); fixtures (hand-made
or captured inputs such as lineage/assign.csv, *.log captures,
dates_mild.tsv) are listed so --list is a complete inventory but are
never regenerated.

Dependency note: entries use pinned golden trees (not freshly
regenerated ones) as --inputTree etc., exactly as tests/ do, so entries
are independently checkable.
"""
from __future__ import annotations

import argparse
import difflib
import os
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "goldens")
REFERENCE = "/root/reference/MAPLEv0.7.5.4.py"
EXAMPLE = "/root/reference/example_files/MAPLE_alignment_example.txt"
B1429 = "/root/reference/example_files/sameRef_B.1.429.maple.gz"
B3000 = os.path.join(HERE, "data_b1429_3000.maple.gz")

STD = ("_tree.tree", "_subs.txt", "_LK.txt")
ROUNDS = STD + ("_round1_preliminary_tree.tree",
                "_round1_subround1_preliminary_tree.tree", "_round1_LK.txt",
                "_round1_subs.txt", "_round1_tree.tree",
                "_round2_preliminary_tree.tree",
                "_round2_subround1_preliminary_tree.tree")
PLACEONLY = ("--doNotReroot", "--numTopologyImprovements", "0",
             "--noFastTopologyInitialSearch")


def G(p):
    return os.path.join(GOLDEN, p)


# name, argv (appended to --input/--output/--overwrite), parts, and
# optional input/tier/source/notes.
REGISTRY = [
    # --- de-novo example families -------------------------------------
    dict(name="example_gtr", argv=["--model", "GTR"], parts=ROUNDS),
    dict(name="example_unrest", argv=["--model", "UNREST"], parts=ROUNDS),
    dict(name="example_gtr_placeonly",
         argv=["--model", "GTR", *PLACEONLY], parts=STD),
    dict(name="example_unrest_placeonly",
         argv=["--model", "UNREST", *PLACEONLY], parts=STD),
    dict(name="example_jc_placeonly",
         argv=["--model", "JC", *PLACEONLY], parts=STD,
         notes="full JC pipeline crashes in the reference (:10879); the "
               "placement-only config is reference-producible"),
    dict(name="example_sprta",
         argv=["--model", "GTR", "--SPRTA", "--estimateMAT"],
         parts=STD + ("_nexusTree.tree", "_metaData.tsv")),
    dict(name="example_sup0",
         argv=["--model", "GTR", "--SPRTA", "--supportFor0Branches"],
         parts=STD + ("_nexusTree.tree", "_metaData.tsv",
                      "_round1_preliminary_tree.tree")),
    dict(name="example_errest",
         argv=["--model", "GTR", "--estimateErrors"],
         parts=STD + ("_estimatedErrors.txt",)),
    dict(name="example_ratevar",
         argv=["--model", "GTR", "--rateVariation"],
         parts=STD + ("_round1_tree.tree", "_round1_subs.txt")),
    dict(name="example_ratevar_ir",
         argv=["--model", "GTR", "--rateVariation",
               "--inputRates", G("example_ratevar_subs.txt")], parts=STD),
    dict(name="example_nolocalref",
         argv=["--model", "GTR", "--noLocalRef"], parts=STD),
    dict(name="example_hnz2", argv=["--model", "GTR", "--HnZ", "2"],
         parts=STD),
    dict(name="example_deeper",
         argv=["--model", "GTR", "--deeperSearchForLongBranches"],
         parts=STD),
    # --- single-flag sweeps -------------------------------------------
    dict(name="sweep_onlyNambiguities",
         argv=["--model", "GTR", "--onlyNambiguities"], parts=STD),
    dict(name="sweep_nonstrict",
         argv=["--model", "GTR", "--nonStrictStopRules"], parts=STD),
    dict(name="sweep_noimprove",
         argv=["--model", "GTR", "--doNotImproveTopology"], parts=STD),
    dict(name="sweep_nonbinary",
         argv=["--model", "GTR", "--nonBinaryTree"], parts=STD),
    dict(name="sweep_sserr",
         argv=["--model", "GTR", "--estimateSiteSpecificErrorRate"],
         parts=STD),
    dict(name="sweep_errfixed",
         argv=["--model", "GTR", "--errorRateFixed", "0.0001"], parts=STD),
    dict(name="sweep_errinit",
         argv=["--model", "GTR", "--estimateErrorRate",
               "--errorRateInitial", "0.0002"], parts=STD),
    dict(name="sweep_rverr",
         argv=["--model", "GTR", "--rateVariation", "--estimateErrors"],
         parts=STD),
    dict(name="sweep_errfile",
         argv=["--model", "GTR", "--errorRateSiteSpecificFile",
               G("sweep_errfile_rates.txt")], parts=STD),
    dict(name="sweep_fast", argv=["--model", "GTR", "--fast"], parts=STD),
    dict(name="sweep_network",
         argv=["--model", "GTR", "--SPRTA", "--networkOutput"],
         parts=STD + ("_nexusTree.tree", "_metaData.tsv")),
    dict(name="sweep_matonly", argv=["--model", "GTR", "--estimateMAT"],
         parts=STD + ("_nexusTree.tree", "_metaData.tsv")),
    dict(name="sweep_savetree",
         argv=["--model", "GTR", "--saveInitialTreeEvery", "50"],
         parts=STD + ("_initialTree_50samples.tree",
                      "_initialTree_100samples.tree")),
    # --- online / input-tree modes ------------------------------------
    dict(name="sub80", input=G("example_sub80.maple"),
         argv=["--model", "GTR"], parts=ROUNDS),
    dict(name="online80", argv=["--model", "GTR",
                                "--inputTree", G("sub80_tree.tree")],
         parts=STD + ("_round1_preliminary_tree.tree",
                      "_round1_subround1_preliminary_tree.tree")),
    dict(name="fsp80",
         argv=["--model", "GTR", "--inputTree", G("sub80_tree.tree"),
               "--findSamplePlacements"],
         parts=("_metaData_samplePlacements.tsv", "_updatedBlengths.tree")),
    dict(name="online_largeupdate",
         argv=["--model", "GTR", "--largeUpdate",
               "--inputTree", G("example_gtr_tree.tree")], parts=STD),
    dict(name="online_errest",
         argv=["--model", "GTR", "--estimateErrors",
               "--inputTree", G("example_gtr_tree.tree")],
         parts=STD + ("_estimatedErrors.txt",
                      "_round1_preliminary_tree.tree")),
    dict(name="parerr",
         argv=["--model", "GTR", "--estimateErrors", "--numCores", "3"],
         parts=STD + ("_estimatedErrors.txt",)),
    dict(name="parallel/par3",
         argv=["--model", "GTR", "--largeUpdate", "--numCores", "3",
               "--inputTree", G("parallel/random_input.tree")],
         parts=STD + ("_round1_tree.tree",)),
    dict(name="parallel/hnz2par3",
         argv=["--model", "GTR", "--largeUpdate", "--numCores", "3",
               "--HnZ", "2",
               "--inputTree", G("parallel/random_input.tree")],
         parts=STD + ("_round1_tree.tree",
                      "_round1_subround2_preliminary_tree.tree",
                      "_round1_subround4_preliminary_tree.tree"),
         notes="HnZ corrections inside the threaded proposal workers; "
               "regression pin for the engine threshold_consec=0 bug"),
    dict(name="parallel/traces",
         argv=["--model", "GTR", "--largeUpdate",
               "--inputTree", G("parallel/random_input.tree"),
               "--writeTreesToFileEveryTheseSteps", "5",
               "--writeLKsToFileEveryTheseSteps", "5"],
         parts=("_intermediateTrees.tree", "_intermediateLKs.txt")),
    dict(name="rfmode",
         argv=["--inputTree", G("example_gtr_tree.tree"),
               "--inputRFtrees", G("example_unrest_placeonly_tree.tree")],
         parts=("_RFdistances.txt",)),
    # --- lineage assignment -------------------------------------------
    dict(name="lineage/newick", input=None,
         argv=["--inputTree", G("example_gtr_tree.tree"),
               "--assignmentFileCSV", G("lineage/assign.csv")],
         parts=("_lineageAssignments.csv", "_nexusTree.tree")),
    dict(name="lineage/reroot", input=None,
         argv=["--inputTree", G("example_gtr_tree.tree"),
               "--assignmentFileCSV", G("lineage/assign.csv"),
               "--reRoot", "DRR272391"],
         parts=("_lineageAssignments.csv",)),
    dict(name="lineage/nexus", input=None,
         argv=["--inputNexusTree", G("lineage/input.nexus"),
               "--assignmentFileCSV", G("lineage/assign.csv")],
         parts=("_lineageAssignments.csv", "_nexusTree.tree")),
    dict(name="lineagerefs/lr",
         argv=["--model", "GTR",
               "--inputTree", G("example_gtr_tree.tree"),
               "--lineageRefs", G("lineagerefs/refs.maple")],
         parts=("_lineageAssignment.tree",
                "_metaData_lineageAssignment.tsv",
                "_metaData_lineagePlacements.tsv",
                "_updatedBlengths.tree")),
    # --- large inputs --------------------------------------------------
    dict(name="b1429_unrest", input=B1429, argv=["--model", "UNREST"],
         parts=ROUNDS, tier="slow",
         notes="~45 min under CPython"),
    dict(name="b3000_ref", input=B3000, argv=["--model", "UNREST"],
         parts=STD, tier="slow"),
    dict(name="b3000_errest", input=B3000,
         argv=["--model", "UNREST", "--estimateErrors"],
         parts=STD + ("_estimatedErrors.txt",), tier="slow",
         notes="~45 min under CPython"),
    # --- time-tree oracle (patched reference copy) -----------------------
    # Source: /root/reference/MAPLEv0.7.5.4.py with the five minimal
    # guards from tests/make_time_oracle.py (no formula changes) — the
    # unpatched reference crashes on every --datesFile input before
    # completing a run.  dates_clock.tsv = clock-consistent dates
    # (2020-02-01 + #mutations/0.09 days per sample).
    dict(name="time_oracle_fixed", oracle=True,
         argv=["--model", "GTR",
               "--inputTree", G("example_gtr_tree.tree"),
               "--datesFile", G("dates_clock.tsv"),
               "--doNotImproveTopology", "--doNotReroot",
               "--doNotOptimiseBLengths"],
         parts=STD,
         notes="independent end-to-end time-tree oracle, fixed tree"),
    dict(name="time_oracle_place", oracle=True,
         argv=["--model", "GTR",
               "--datesFile", G("dates_clock.tsv"),
               "--numTopologyImprovements", "0",
               "--noFastTopologyInitialSearch", "--doNotReroot",
               "--doNotOptimiseBLengths"],
         parts=STD,
         notes="independent time-tree oracle, de-novo placement phase"),
]

# Inputs/captures that are part of the fixture set, never regenerated.
FIXTURES = [
    "example_sub80.maple (deterministic 80-sample subset of the example)",
    "sweep_errfile_rates.txt (hand-made per-site error rates)",
    "parallel/random_input.tree (seeded random topology over the example)",
    "lineage/assign.csv, lineage/input.nexus (hand-made lineage fixtures)",
    "lineagerefs/refs.maple (subset lineage reference genomes)",
    "dates_mild.tsv (hand-made dates; adversarial — even the patched "
    "oracle cannot complete on it, see make_time_oracle.py)",
    "dates_clock.tsv (clock-consistent dates for the example samples: "
    "2020-02-01 + #mutations/0.09 days; the time-oracle input)",
    "*.log (captured reference run logs, kept for timing provenance)",
    "scripts/* (inputs + outputs of the companion-script differential "
    "tests; regenerated inside tests/test_scripts.py itself)",
]


def run_entry(e, workdir):
    out = os.path.join(workdir, e["name"].replace("/", "_"))
    binary = REFERENCE
    if e.get("oracle"):
        # time-tree entries run the minimally patched oracle copy
        binary = os.path.join(workdir, "MAPLE_timefix.py")
        if not os.path.isfile(binary):
            r = subprocess.run(
                [sys.executable, os.path.join(HERE, "make_time_oracle.py"),
                 "--out", binary], capture_output=True, text=True)
            if r.returncode != 0:
                return out, f"oracle build failed: {r.stderr[-500:]}"
    argv = [sys.executable, binary, "--output", out, "--overwrite"]
    inp = e.get("input", EXAMPLE)
    if inp:
        argv += ["--input", inp]
    argv += e["argv"]
    r = subprocess.run(argv, capture_output=True, text=True)
    if r.returncode != 0:
        return out, f"reference exited {r.returncode}: {r.stderr[-800:]}"
    return out, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--tier", choices=["fast", "all"], default="fast")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    if args.list or not (args.check or args.update):
        for e in REGISTRY:
            print(f"{e['name']:28s} tier={e.get('tier', 'fast'):5s} "
                  f"parts={len(e['parts'])}"
                  + (f"  [{e['notes']}]" if e.get("notes") else ""))
        print("\nfixtures (never regenerated):")
        for f in FIXTURES:
            print("  -", f)
        return 0

    if not os.path.isfile(REFERENCE):
        print("reference implementation not available", file=sys.stderr)
        return 2

    entries = [e for e in REGISTRY
               if (args.only is None or e["name"] in args.only)
               and (args.tier == "all" or e.get("tier", "fast") == "fast")]
    failures = []
    workdir = tempfile.mkdtemp(prefix="maple_regen_")
    try:
        for e in entries:
            out, err = run_entry(e, workdir)
            if err:
                failures.append((e["name"], err))
                print(f"FAIL {e['name']}: {err}")
                continue
            for part in e["parts"]:
                got_p = out + part
                want_p = G(e["name"] + part)
                if not os.path.isfile(got_p):
                    failures.append((e["name"], f"missing output {part}"))
                    print(f"FAIL {e['name']}{part}: reference produced no "
                          "such file")
                    continue
                if args.update:
                    shutil.copyfile(got_p, want_p)
                    print(f"updated {e['name']}{part}")
                    continue
                with open(got_p) as f:
                    got = f.read()
                want = ""
                if os.path.isfile(want_p):
                    with open(want_p) as f:
                        want = f.read()
                if got != want:
                    failures.append((e["name"], f"{part} differs"))
                    diff = "".join(difflib.unified_diff(
                        want.splitlines(True)[:8], got.splitlines(True)[:8],
                        "golden", "reference"))
                    print(f"FAIL {e['name']}{part} differs:\n{diff[:600]}")
                else:
                    print(f"ok   {e['name']}{part}")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    if failures:
        print(f"\n{len(failures)} failure(s)")
        return 1
    print(f"\nall {len(entries)} entries match their goldens")
    return 0


if __name__ == "__main__":
    sys.exit(main())
