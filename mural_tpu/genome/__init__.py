from mural_tpu.genome.fasta import Genome, read_fasta_codes, encode_sequence
from mural_tpu.genome.bed import BedFile, BedSite, segment_sites
from mural_tpu.genome import encode

__all__ = [
    "Genome",
    "read_fasta_codes",
    "encode_sequence",
    "BedFile",
    "BedSite",
    "segment_sites",
    "encode",
]
