from nucleoatac_tpu.io.bam import BamFragments, scan_bam
from nucleoatac_tpu.io.fasta import FastaFile

__all__ = ["BamFragments", "scan_bam", "FastaFile"]
