"""Differential test: scripts/maple_data_processing.py vs the reference
scripts/MapleDataProcessing.py on a synthetic Viridian-style dataset.

The reference hard-codes every path, so both scripts are run with
cwd=<their own tmp dir> holding identical inputs; every stage's output
file must match byte-for-byte."""
import gzip
import os
import shutil
import subprocess
import sys

import pytest

HERE = os.path.dirname(__file__)
SCRIPTS = os.path.join(HERE, "..", "scripts")
REF_SCRIPT = "/root/reference/scripts/MapleDataProcessing.py"

REF_SEQ = "A" * 100 + "C" * 100


def _qc_rows(spec):
    """Viridian qc.tsv.gz body: col0=pos, col9=coverage,
    cols 11-18 = ACGT forward/reverse read counts."""
    lines = ["pos\tref\t" + "\t".join(f"c{i}" for i in range(2, 19))]
    for pos, cov, counts in spec:
        fields = [str(pos), "A"] + ["0"] * 7 + [str(cov), "0"]
        for c in counts:
            fields += [str(c // 2), str(c - c // 2)]
        lines.append("\t".join(fields))
    return "".join(line + "\n" for line in lines)


SAMPLES = {
    # clean: high coverage, one mild het position -> kept
    "ERR1234567": [(1, 150, (140, 0, 0, 0)),
                   (40, 150, (120, 20, 0, 0)),
                   (60, 300, (295, 0, 0, 0))],
    # three strong-het positions (2 alleles >39 reads at >20%) -> filtered
    "SRR12345678": [(1, 200, (100, 90, 0, 0)),
                    (30, 200, (110, 0, 85, 0)),
                    (70, 200, (105, 0, 0, 88)),
                    (90, 200, (195, 0, 0, 0))],
    # ends in cov<20 at pos 100 -> ~29804 low-coverage sites -> filtered
    "DRR123456": [(1, 300, (290, 0, 0, 0)),
                  (100, 5, (5, 0, 0, 0))],
    # long-form ENA accession resolved via the second path layout
    "ERR12345678": [(1, 250, (240, 0, 0, 0)),
                    (50, 250, (120, 110, 0, 0)),
                    (55, 250, (119, 111, 0, 0))],
}

ALIGNMENT_DIFFS = {
    "ERR1234567": ["t\t10\n", "-\t80\t10\n", "-\t95\n", "-\t96\t1\n",
                   "n\t150\t5\n", "a\t274\n", "n\t274\t1\n"],
    "SRR12345678": ["g\t20\n", "-\t30\t10\n"],
    "DRR123456": ["-\t40\n", "-\t50\t1\n", "-\t60\t31\n", "c\t120\n"],
    "ERR12345678": ["y\t25\n", "n\t4321\t1\n", "t\t4321\n"],
    # no QC store entry (non-ENA prefix): summarize prints and skips it
    "XYZsample": ["a\t130\n", "-\t140\t30\n", "-\t175\t31\n"],
}


def _qc_path(root, name):
    if name == "ERR12345678":
        # force the fallback layout (reference :107-111 second try)
        return os.path.join(root, "Vdn_all_ena", "Reads", "E", name[1:7],
                            name[7:9], name[9:11], "vdn.v1.0.0",
                            "qc.tsv.gz")
    if name[0] == "E":
        return os.path.join(root, "Vdn_all_ena", "Reads", "E", name[1:6],
                            name[6:8], name[8:10], "vdn.v1.0.0",
                            "qc.tsv.gz")
    if name[0] == "S":
        return os.path.join(root, "Vdn_all_ena", "Reads", "S", name[1:7],
                            name[7:9], name[9:11], "vdn.v1.0.0",
                            "qc.tsv.gz")
    return os.path.join(root, "Vdn_all_ena", "Reads", "D", name[1:5],
                        name[5:7], name[7:9], "vdn.v1.0.0", "qc.tsv.gz")


def _build_dataset(root):
    with open(os.path.join(root, "alignment.maple"), "w") as f:
        f.write(">reference\n" + REF_SEQ + "\n")
        for name, diffs in ALIGNMENT_DIFFS.items():
            f.write(">" + name + "\n")
            f.writelines(diffs)
    for name, spec in SAMPLES.items():
        path = _qc_path(root, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with gzip.open(path, "wt") as f:
            f.write(_qc_rows(spec))
    # the analyse stage unconditionally opens QCsummary1..100
    for i in range(2, 101):
        open(os.path.join(root, f"QCsummary{i}.txt"), "w").close()


def _run(script, cwd, *args):
    return subprocess.run([sys.executable, script, *args], cwd=cwd,
                          check=True, capture_output=True, text=True)


STAGE_OUTPUTS = [
    ("QCsummary1.txt", ("--summarizeQCfiles", "1", "--coreQC", "1")),
    ("alignment_filtered.maple", ("--analyseQCsummaryFiles",)),
    ("alignment_filtered_noShortDeletions.maple",
     ("--removeOnlyShortCommonDeletions",)),
    ("alignment_filtered_noShortDeletions_masked.maple",
     ("--maskAlignment",)),
]


def test_all_stages_match_reference(tmp_path):
    if not os.path.isfile(REF_SCRIPT):
        pytest.skip("reference script not available")
    ref_dir = tmp_path / "ref"
    my_dir = tmp_path / "mine"
    for d in (ref_dir, my_dir):
        d.mkdir()
        _build_dataset(str(d))
    mine = os.path.abspath(os.path.join(SCRIPTS,
                                        "maple_data_processing.py"))
    for out_name, flags in STAGE_OUTPUTS:
        ref_res = _run(REF_SCRIPT, str(ref_dir), *flags)
        my_res = _run(mine, str(my_dir), *flags)
        ref_out = (ref_dir / out_name).read_text()
        my_out = (my_dir / out_name).read_text()
        assert my_out == ref_out, f"stage {flags} output differs"
        assert ref_out != ""
        if flags == ("--analyseQCsummaryFiles",):
            # histogram / filter-count report must match too
            assert my_res.stdout == ref_res.stdout

    # the filter decisions the synthetic data was built to exercise
    filtered = (my_dir / "alignment_filtered.maple").read_text()
    assert ">ERR1234567\n" in filtered
    assert ">XYZsample\n" in filtered
    assert ">SRR12345678" not in filtered
    assert ">DRR123456\n" not in filtered
    masked = (my_dir /
              "alignment_filtered_noShortDeletions_masked.maple")
    body = masked.read_text()
    assert "a\t274" not in body          # substitution at masked site
    assert "n\t274\t1" not in body       # length-1 N run at masked site
    assert "n\t150\t5" in body           # other N runs kept
    assert "-\t95\n" in body             # length-field-less deletion kept
    assert "-\t80\t10" not in body       # short deletion dropped
    assert "-\t96\t1" not in body        # explicit length-1 dropped
    assert "-\t140\t30" not in body      # 30-base deletion dropped
    assert "-\t175\t31" in body          # 31-base deletion kept


def test_list_deletion_abundances(tmp_path):
    _build_dataset(str(tmp_path))
    shutil.copy(tmp_path / "alignment.maple",
                tmp_path / "alignment_filtered.maple")
    mine = os.path.abspath(os.path.join(SCRIPTS,
                                        "maple_data_processing.py"))
    res = _run(mine, str(tmp_path), "--listDeletionAbundances")
    assert "('40+1', 1)" in res.stdout
    assert "('60+31', 1)" in res.stdout
