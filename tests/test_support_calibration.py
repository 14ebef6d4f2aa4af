"""SPRTA support calibration on simulated data with known topology
(scripts/benchmark_support.py — the reference's
benchmarking_branchSupport.py:10-38 workflow).  Deterministic: seeded
generator + deterministic inference."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_supports_monotonically_informative(tmp_path):
    gen = os.path.join(REPO, "scripts", "make_synthetic_alignment.py")
    aln = str(tmp_path / "sup.maple.gz")
    truth = str(tmp_path / "sup_truth.nwk")
    # noisy regime (few private mutations, lots of Ns) so placements are
    # genuinely uncertain and the support spectrum is populated
    subprocess.run(
        [sys.executable, gen, "--samples", "1000", "--seed", "1",
         "--mutRate", "0.4", "--nRate", "2", "--output", aln,
         "--treeOut", truth], check=True, timeout=300)

    from scripts.benchmark_support import run_calibration
    rows, n_supported = run_calibration(aln, truth,
                                        str(tmp_path / "run"))
    assert n_supported > 100

    top = [r for r in rows if r[0] >= 0.95 and r[2] > 0]
    low = [r for r in rows if r[1] <= 0.8 and r[2] > 0]
    assert top and top[-1][2] >= 50
    top_frac = top[-1][3]
    assert top_frac >= 0.85
    # pooled low-support branches must be less often correct than the
    # high-support ones — supports are monotonically informative
    low_n = sum(r[2] for r in low)
    if low_n:
        low_frac = sum(r[2] * r[3] for r in low) / low_n
        assert low_frac < top_frac
