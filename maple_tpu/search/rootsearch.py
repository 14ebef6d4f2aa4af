"""Root-position search (reference findBestRoot :7730-7902). Implemented in
the SPR milestone."""


def find_best_root(rt, root, **kw):
    raise NotImplementedError("root search lands with the SPR milestone")
