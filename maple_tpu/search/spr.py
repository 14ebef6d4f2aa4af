"""SPR topology search (reference findBestParentTopology :6817-7724 and
friends). Implemented in the SPR milestone."""


def run_spr_rounds(run, rounds):
    raise NotImplementedError("SPR search lands with the SPR milestone")
