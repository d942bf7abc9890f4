#!/usr/bin/env python
"""Burst-batched QPSK demod chain + CP2FSK Viterbi throughput (reference
analogues: the demodBatch GPU chain demodulationRoutines.py:1131 and the
PyViterbiDemodulator benchmark).

Usage: python benchmarks/benchmark_demod.py [bursts] [nsyms]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import bench_qpsk_demod_batch, bench_cp2fsk_viterbi


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nsyms = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    rate, cpu = bench_qpsk_demod_batch(B=B, nsyms=nsyms)
    print(f"QPSK demod batch {B}x{nsyms * 4}: {rate:8.1f} Msamples/s "
          f"(numpy single-burst tier: {cpu:.1f})")
    rate, cpu = bench_cp2fsk_viterbi()
    print(f"CP2FSK Viterbi 64x512:      {rate:8.1f} Msymbols/s "
          f"(numpy trellis tier: {cpu:.2f})")


if __name__ == "__main__":
    main()
