"""Run configuration (SURVEY.md §5.6; reference: xerial annotation options).

One dataclass per subcommand, mirroring the reference CLI's knobs (k, band
width, sample rate, paths) plus the TPU-rebuild's mesh/sharding knobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class IndexConfig:
    genome: str  # FASTA path
    out: str  # output .npz index path
    sample_rate: int = 32  # sparse-SA sampling (locate cost ~ sample_rate)
    builder: str = "auto"  # auto | native | numpy | device


@dataclass
class AlignConfig:
    index: str  # index .npz path
    reads: str  # FASTA/FASTQ path
    out: str = "-"  # SAM path or '-' for stdout
    k: int = 2  # max edit distance
    mode: str = "auto"  # auto | exact | onemm | pigeonhole | staircase
    batch_size: int = 4096
    max_hits_per_piece: int = 16
    # mesh
    n_data: int | None = None  # default: all devices on the data axis
    n_interval: int = 1
    shard_index: bool = False  # interval-shard instead of replicate
