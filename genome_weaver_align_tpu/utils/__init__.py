from . import bitvector, config, dna, fasta, larray, log, packing, sam, simulate  # noqa: F401
