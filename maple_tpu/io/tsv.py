"""Taxonium metadata TSV writer (reference writeTSVfile :12065-12140).
Implemented with the SPRTA milestone."""


def write_tsv_file(run, path):
    raise NotImplementedError("TSV output lands with the SPRTA milestone")
