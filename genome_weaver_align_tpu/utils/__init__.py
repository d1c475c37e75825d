from . import dna, packing, bitvector, larray, fasta, sam, simulate
