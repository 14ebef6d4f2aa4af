from .pack import pack_genome_list, pack_genome_lists, PackedBatch  # noqa
