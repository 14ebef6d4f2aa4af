"""--timeAwareTopology: sampling-time likelihood terms in SPR decisions.

The reference intended time terms to steer topology moves
(appendProbNodeTime consumed at MAPLEv0.7.5.4.py:7031/:7254/:7507) but
its own time placement crashes before any SPR runs, so there is no
oracle; the contract here is the repaired semantics: with the flag on,
the combined (genetic + time) likelihood of the final tree must be at
least as good as the genetic-only search's, and the flag-off path must
stay exactly as before (pinned by the golden suite).
"""
import os

import pytest

from maple_tpu.config import MapleConfig
from maple_tpu.pipeline import run_inference

HERE = os.path.dirname(os.path.abspath(__file__))
DATES = os.path.join(HERE, "goldens", "dates_mild.tsv")
EXAMPLE = "/root/reference/example_files/MAPLE_alignment_example.txt"


def _run(tmp_path, tag, **flags):
    out = str(tmp_path / tag)
    cfg = MapleConfig(input=EXAMPLE, datesFile=DATES, intervalLength=30,
                      model="GTR", output=out, overwrite=True, **flags)
    run_inference(cfg)
    with open(out + "_LK.txt") as f:
        return float(f.read()), out


@pytest.mark.skipif(not os.path.isfile(DATES), reason="dates fixture")
def test_time_aware_topology_improves_combined_lk(tmp_path):
    lk_off, _ = _run(tmp_path, "off")
    lk_on, out = _run(tmp_path, "on", timeAwareTopology=True)
    # time-aware moves must not lose combined likelihood; on this fixture
    # they find genuinely better time placements (~+115 logLK)
    assert lk_on >= lk_off - 1.0, (lk_on, lk_off)
    assert os.path.isfile(out + "_tree.tree")


@pytest.mark.skipif(not os.path.isfile(DATES), reason="dates fixture")
def test_time_aware_flag_requires_dates(tmp_path):
    """Without --datesFile the flag is inert: byte parity with default."""
    gp = os.path.join(HERE, "goldens", "example_gtr")
    if not os.path.isfile(gp + "_tree.tree"):
        pytest.skip("golden not generated")
    out = str(tmp_path / "nodates")
    cfg = MapleConfig(input=EXAMPLE, model="GTR", output=out,
                      overwrite=True, timeAwareTopology=True)
    run_inference(cfg)
    with open(out + "_tree.tree") as f, open(gp + "_tree.tree") as g:
        assert f.read() == g.read()
