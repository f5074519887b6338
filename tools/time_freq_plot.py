#!/usr/bin/env python3
"""Scope / spectrum / constellation plots of a modulator output I/Q file
(port of the reference's doc/time-freq-plot.py offline analysis tool).

Usage: time_freq_plot.py out.iq [--format complexf|s16|u8|s8]
                                [--rate 2048000] [--save plot.png]
"""
import argparse

import numpy as np


def load_iq(path: str, fmt: str) -> np.ndarray:
    if fmt in ("complexf", "f32"):
        return np.fromfile(path, np.complex64)
    if fmt == "s16":
        d = np.fromfile(path, np.int16).astype(np.float32)
    elif fmt == "u8":
        d = np.fromfile(path, np.uint8).astype(np.float32) - 128.0
    elif fmt == "s8":
        d = np.fromfile(path, np.int8).astype(np.float32)
    else:
        raise ValueError(fmt)
    return (d[0::2] + 1j * d[1::2]).astype(np.complex64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--format", default="complexf")
    ap.add_argument("--rate", type=float, default=2_048_000)
    ap.add_argument("--save", default=None)
    ap.add_argument("--nfft", type=int, default=8192)
    args = ap.parse_args()

    import matplotlib
    if args.save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = load_iq(args.file, args.format)
    n = min(x.size, 4 * 196608)
    x = x[:n]

    fig, axes = plt.subplots(3, 1, figsize=(10, 10))
    t = np.arange(min(n, 20000)) / args.rate * 1e3
    axes[0].plot(t, x[:t.size].real, lw=0.4, label="I")
    axes[0].plot(t, x[:t.size].imag, lw=0.4, label="Q")
    axes[0].set_xlabel("time [ms]")
    axes[0].set_title("scope")
    axes[0].legend()

    nseg = x.size // args.nfft
    segs = x[:nseg * args.nfft].reshape(nseg, args.nfft)
    psd = np.abs(np.fft.fftshift(np.fft.fft(segs, axis=1), axes=1)) ** 2
    psd = 10 * np.log10(psd.mean(axis=0) + 1e-12)
    freqs = np.fft.fftshift(np.fft.fftfreq(args.nfft, 1 / args.rate)) / 1e3
    axes[1].plot(freqs, psd, lw=0.5)
    axes[1].set_xlabel("frequency [kHz]")
    axes[1].set_ylabel("PSD [dB]")
    axes[1].set_title("spectrum")

    axes[2].plot(x[2656:2656 + 8192].real, x[2656:2656 + 8192].imag,
                 ".", ms=1, alpha=0.3)
    axes[2].set_title("I/Q samples")
    axes[2].set_aspect("equal")

    fig.tight_layout()
    if args.save:
        fig.savefig(args.save, dpi=120)
        print(f"saved {args.save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
