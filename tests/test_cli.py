"""CLI end-to-end: index -> simulate -> align -> SAM on disk."""

import numpy as np

from genome_weaver_align_tpu.cli import main
from genome_weaver_align_tpu.utils import dna
from genome_weaver_align_tpu.utils.fasta import Contig, write_fasta


def test_cli_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    fa = tmp_path / "g.fa"
    write_fasta(
        fa,
        [
            Contig("chr1", rng.integers(0, 4, size=9000, dtype=np.uint8)),
            Contig("chr2", rng.integers(0, 4, size=6000, dtype=np.uint8)),
        ],
    )
    idx = tmp_path / "g.npz"
    assert main(["index", str(fa), "-o", str(idx), "--sample-rate", "16"]) == 0

    reads = tmp_path / "r.fq"
    assert (
        main(
            [
                "simulate",
                str(fa),
                "-o",
                str(reads),
                "-n",
                "50",
                "-l",
                "80",
                "--sub-rate",
                "0.02",
                "--max-subs",
                "2",
            ]
        )
        == 0
    )

    out = tmp_path / "out.sam"
    assert main(["align", str(idx), str(reads), "-k", "2", "-o", str(out)]) == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith("@HD")
    sq = [l for l in lines if l.startswith("@SQ")]
    assert len(sq) == 2
    body = [l for l in lines if not l.startswith("@")]
    assert len(body) == 50
    mapped = [l for l in body if not (int(l.split("\t")[1]) & 0x4)]
    assert len(mapped) == 50

    assert main(["dump", str(idx)]) == 0
