"""Independent numpy simulator of the reference CLI's analysis/apply loop.

A deliberately *literal* float32 re-derivation of the serial block-by-block
algorithm (PhaseRotateProc / PhaseRotate, cli/phase-rotate.cc:125-485),
used as the parity oracle for the batched TPU sweep.  Slow by construction;
tests keep inputs small.
"""

from __future__ import annotations

import numpy as np

SUBSAMPLE = 2
MAXSAMPLE = 180 * SUBSAMPLE


def sincos_lut():
    mp = 2.0 * np.pi / SUBSAMPLE / -360.0
    idx = np.arange(MAXSAMPLE)
    return (
        np.sin(mp * idx).astype(np.float32),
        np.cos(mp * idx).astype(np.float32),
    )


class RefProc:
    """PhaseRotateProc (cli/phase-rotate.cc:125-245) in numpy float32."""

    def __init__(self, blksiz: int):
        self.parsiz = blksiz
        self.fftlen = 2 * blksiz
        self.firlen = blksiz // 2
        # FIR design (cli/phase-rotate.cc:144-164): spec j*(-1)^k over
        # firlen+1 bins, c2r of size parsiz, Hann windowed; all FFTW
        # normalizations reduce to irfft * hann (see core/fir.py).
        k = np.arange(self.firlen + 1)
        spec = 1j * np.where(k & 1, -1.0, 1.0)
        fir = np.fft.irfft(spec, n=self.parsiz)
        n = np.arange(self.parsiz)
        hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / self.parsiz))
        fir = (fir * hann).astype(np.float32)
        self.ffir = np.fft.rfft(
            np.concatenate([fir, np.zeros(self.parsiz, np.float32)])
        )

    def hilbert(self, tdc: np.ndarray, out: np.ndarray, o_out: np.ndarray):
        """cli/phase-rotate.cc:181-212. tdc: (fftlen,) [prev, cur]."""
        parsiz = self.parsiz
        out[:] = o_out  # copy end/overlap of prev iFFT
        time_data = np.concatenate(
            [tdc[parsiz:], np.zeros(parsiz, np.float32)]
        )
        freq = np.fft.rfft(time_data) * self.ffir
        y = np.fft.irfft(freq, n=self.fftlen).astype(np.float32)
        out += y[:parsiz]
        o_out[:] = y[parsiz:]

    def rotate(self, tdc, out, a, sin_t, cos_t):
        """cli/phase-rotate.cc:214-225."""
        sa, ca = sin_t[a], cos_t[a]
        fin = tdc[self.firlen : self.firlen + self.parsiz]
        out[:] = (ca * fin + sa * out).astype(np.float32)


class RefRotate:
    """PhaseRotate analysis/apply (cli/phase-rotate.cc:251-485)."""

    def __init__(self, blksiz: int, n_chn: int):
        self.proc = [RefProc(blksiz) for _ in range(n_chn)]
        self.n_chn = n_chn
        self.parsiz = blksiz
        self.sin_t, self.cos_t = sincos_lut()
        self.reset()

    def reset(self):
        p = self.parsiz
        self.buf_old = [np.zeros(p, np.float32) for _ in range(self.n_chn)]
        self.buf_olp = [np.zeros(p, np.float32) for _ in range(self.n_chn)]
        self.peak = np.zeros((self.n_chn, MAXSAMPLE), np.float32)

    def analyze_block(self, block, ang_start, ang_end, ang_stride,
                      chn=-1, start=False):
        """thr_process per channel (cli/phase-rotate.cc:389-429).
        block: (n_chn, parsiz) deinterleaved float32."""
        parsiz = self.parsiz
        firlen = parsiz // 2
        chans = range(self.n_chn) if chn < 0 else [chn]
        for c in chans:
            tdc = np.concatenate([self.buf_old[c], block[c]])
            self.buf_old[c] = tdc[parsiz:].copy()
            hil = np.empty(parsiz, np.float32)
            self.proc[c].hilbert(tdc, hil, self.buf_olp[c])
            angle = ang_start
            while angle <= ang_end:
                a = (angle + MAXSAMPLE) % MAXSAMPLE
                if angle == 0:
                    pk = np.abs(self.buf_old[c]).max()
                else:
                    if start:
                        b0 = tdc[firlen : firlen + firlen]
                        b1 = hil[firlen : firlen + firlen]
                    else:
                        b0 = tdc[firlen : firlen + parsiz]
                        b1 = hil
                    sa, ca = self.sin_t[a], self.cos_t[a]
                    x = (ca * b0 + sa * b1).astype(np.float32)
                    pk = np.abs(x).max()
                self.peak[c][a] = max(self.peak[c][a], np.float32(pk))
                angle += ang_stride
                if angle >= ang_end:
                    break

    def analyze_file(self, audio, ang_start, ang_end, ang_stride, chn=-1):
        """analyze_file (cli/phase-rotate.cc:565-587): silence-pad short
        reads, one trailing zero block.  audio: (n_chn, n)."""
        parsiz = self.parsiz
        n = audio.shape[1]
        start = True
        pos = 0
        while pos < n:
            blk = np.zeros((self.n_chn, parsiz), np.float32)
            m = min(parsiz, n - pos)
            blk[:, :m] = audio[:, pos : pos + m]
            self.analyze_block(blk, ang_start, ang_end, ang_stride, chn, start)
            start = False
            pos += parsiz
        self.analyze_block(
            np.zeros((self.n_chn, parsiz), np.float32),
            ang_start, ang_end, ang_stride, chn, False,
        )

    def apply_file(self, audio, angle_units):
        """apply path incl. latency skip and tail flush
        (cli/phase-rotate.cc:447-485, 963-1001). audio: (n_chn, n)."""
        parsiz = self.parsiz
        latency = parsiz // 2
        n = audio.shape[1]
        outs = []
        written = 0
        off = latency
        pad = 0
        pos = 0
        while pos < n:
            m = min(parsiz, n - pos)
            blk = np.zeros((self.n_chn, parsiz), np.float32)
            blk[:, :m] = audio[:, pos : pos + m]
            nn = m
            if m < latency:
                pad = latency - m
                nn = m + pad
            out = self._apply_block(blk, angle_units)
            nn -= off
            outs.append(out[:, off : off + nn])
            off = 0
            pos += parsiz
        nrem = latency - pad
        if nrem > 0:
            out = self._apply_block(
                np.zeros((self.n_chn, parsiz), np.float32), angle_units
            )
            outs.append(out[:, :nrem])
        return np.concatenate(outs, axis=1)

    def _apply_block(self, blk, angle_units):
        parsiz = self.parsiz
        out = np.empty((self.n_chn, parsiz), np.float32)
        for c in range(self.n_chn):
            tdc = np.concatenate([self.buf_old[c], blk[c]])
            self.buf_old[c] = tdc[parsiz:].copy()
            a = (angle_units[c] + MAXSAMPLE) % MAXSAMPLE
            self.proc[c].hilbert(tdc, out[c], self.buf_olp[c])
            self.proc[c].rotate(tdc, out[c], a, self.sin_t, self.cos_t)
        return out
