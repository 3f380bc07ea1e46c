"""Arrow-batched pandas-UDF kernels for the two HRV features that are
genuinely not expressible as DataFrame aggregates (SURVEY.md §2.9):
frequency-domain PSD band powers and sample entropy.

These are the ONLY Python-side hot paths in the engine; they run per
(record, window) group via ``applyInPandas``, so the Arrow transfer is
one batch per group and the numpy kernels are vectorized inside.
Guards: groups shorter than the kernel minimum return NULL features
instead of raising (the agg_having min-beats guard should run first).

scipy is unavailable in this environment, so Welch PSD is implemented
directly on numpy.fft (hann window, 50% overlap, constant detrend per
segment, one-sided density scaling) — same estimator family the
reference uses via scipy.signal.welch [PK:high]; numerical parity with
scipy is not claimed, band definitions are (vlf 0.003–0.04, lf
0.04–0.15, hf 0.15–0.40 Hz) [PK:high].
"""

from __future__ import annotations

import numpy as np
import pandas as pd

FREQ_SCHEMA = ("record_id long, n_beats long, vlf double, lf double, hf double, "
               "total_power double, lf_hf_ratio double, lfnu double, hfnu double")

SAMPEN_SCHEMA = "record_id long, n_beats long, sampen double"

VLF_BAND = (0.003, 0.04)
LF_BAND = (0.04, 0.15)
HF_BAND = (0.15, 0.40)


def welch_psd(x: np.ndarray, fs: float, nperseg: int = 256):
    """One-sided Welch periodogram (hann, 50% overlap, mean-detrend)."""
    n = len(x)
    nperseg = int(min(nperseg, n))
    win = np.hanning(nperseg)
    step = max(1, nperseg - nperseg // 2)
    specs = []
    for start in range(0, n - nperseg + 1, step):
        seg = x[start:start + nperseg]
        seg = (seg - seg.mean()) * win
        specs.append(np.abs(np.fft.rfft(seg)) ** 2)
    psd = np.mean(specs, axis=0) / (fs * (win ** 2).sum())
    psd[1:-1] *= 2.0
    freqs = np.fft.rfftfreq(nperseg, 1.0 / fs)
    return freqs, psd


def _band_power(freqs: np.ndarray, psd: np.ndarray, band: tuple[float, float]) -> float:
    mask = (freqs >= band[0]) & (freqs < band[1])
    if mask.sum() < 2:
        return 0.0
    return float(np.trapz(psd[mask], freqs[mask]))


RESAMPLE_HZ = 4.0  # module constant, NOT a kernel kwarg: a 2-arg fn
                   # would be read by applyInPandas as the (key, pdf) form


def freq_domain_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group frequency features: RR series → uniform 4 Hz resample
    (linear interp over cumulative beat time) → Welch → band powers."""
    fs = RESAMPLE_HZ
    record_id = pdf["record_id"].iloc[0]
    pdf = pdf.sort_values("beat_ts")
    rri = pdf["rri"].to_numpy(dtype=np.float64)
    n = len(rri)
    out = {"record_id": [record_id], "n_beats": [n], "vlf": [None], "lf": [None],
           "hf": [None], "total_power": [None], "lf_hf_ratio": [None],
           "lfnu": [None], "hfnu": [None]}
    if n >= 16:
        t = np.cumsum(rri) / 1000.0  # beat times, seconds
        t = t - t[0]
        grid = np.arange(0.0, t[-1], 1.0 / fs)
        if len(grid) >= 32:
            x = np.interp(grid, t, rri)
            freqs, psd = welch_psd(x, fs)
            vlf = _band_power(freqs, psd, VLF_BAND)
            lf = _band_power(freqs, psd, LF_BAND)
            hf = _band_power(freqs, psd, HF_BAND)
            total = vlf + lf + hf
            out.update(
                vlf=[vlf], lf=[lf], hf=[hf], total_power=[total],
                lf_hf_ratio=[lf / hf if hf > 0 else None],
                lfnu=[100.0 * lf / (lf + hf) if lf + hf > 0 else None],
                hfnu=[100.0 * hf / (lf + hf) if lf + hf > 0 else None],
            )
    return pd.DataFrame(out)


def sample_entropy(x: np.ndarray, m: int = 2, r: float | None = None) -> float | None:
    """SampEn(m=2, r=0.2·std) — nolds-style [PK:high]. O(n²) in the
    template comparisons; callers must bound group size (agg_having)."""
    n = len(x)
    if n < m + 2:
        return None
    if r is None:
        r = 0.2 * float(np.std(x))  # population std, nolds default
    if r == 0:
        return None

    def _count(mm: int) -> int:
        tm = np.lib.stride_tricks.sliding_window_view(x, mm)
        total = 0
        for i in range(len(tm) - 1):
            d = np.max(np.abs(tm[i + 1:] - tm[i]), axis=1)
            total += int(np.sum(d <= r))
        return total

    b = _count(m)
    a = _count(m + 1)
    if a == 0 or b == 0:
        return None
    return float(-np.log(a / b))


def sampen_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    record_id = pdf["record_id"].iloc[0]
    pdf = pdf.sort_values("beat_ts")
    rri = pdf["rri"].to_numpy(dtype=np.float64)
    return pd.DataFrame({
        "record_id": [record_id],
        "n_beats": [len(rri)],
        "sampen": [sample_entropy(rri)],
    })


TINN_SCHEMA = "record_id long, n_bins long, tinn double"

_BIN_MS = 7.8125  # 128 Hz-heritage histogram bin width (Task Force)


def tinn_fit(bins: np.ndarray, counts: np.ndarray) -> float | None:
    """TINN: M − N (ms) of the least-squares triangular interpolation
    of the NN histogram (Kubios / Task-Force definition; hrvanalysis
    itself returns tinn=None, so this is the engine's own fit).

    ``bins`` are integer bin indices (rri // 7.8125), ``counts`` their
    occupancies. The triangle q is 0 at edges N and M and peaks at the
    modal bin X with height D(X); the search scans every (N ≤ X, M ≥ X)
    edge pair on the bin grid minimizing Σ_t (D(t) − q(t))² over the
    FULL histogram support (mass outside [N, M] is penalized, matching
    the published objective). O(B²·B) with a vectorized inner sum — B
    is bounded by the physiologic RR range, not by beat count.
    Tie-break: smallest error, then smallest width, then smallest N
    (deterministic output for flat histograms)."""
    if len(bins) == 0:
        return None
    lo, hi = int(bins.min()), int(bins.max())
    nb = hi - lo + 1
    if nb < 3:
        return None
    dens = np.zeros(nb, dtype=np.float64)
    dens[bins - lo] = counts
    x = int(np.argmax(dens))  # first modal bin on ties
    centers = np.arange(nb, dtype=np.float64)
    peak = dens[x]
    best = None
    for n_idx in range(0, x):
        rise = np.zeros(nb)
        seg = centers[n_idx:x + 1]
        rise[n_idx:x + 1] = peak * (seg - n_idx) / (x - n_idx) \
            if x > n_idx else peak
        for m_idx in range(x + 1, nb):
            q = rise.copy()
            seg2 = centers[x:m_idx + 1]
            q[x:m_idx + 1] = peak * (m_idx - seg2) / (m_idx - x)
            q[x] = peak
            err = float(np.sum((dens - q) ** 2))
            key = (err, m_idx - n_idx, n_idx)
            if best is None or key < best[0]:
                best = (key, n_idx, m_idx)
    if best is None:
        return None
    _, n_idx, m_idx = best
    return float((m_idx - n_idx) * _BIN_MS)


def tinn_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-record TINN over pre-aggregated (bin, count) rows — the
    histogramming ran as a distributed groupBy upstream, so this kernel
    is O(bins²) regardless of how many beats the record has."""
    record_id = pdf["record_id"].iloc[0]
    bins = pdf["bin"].to_numpy(dtype=np.int64)
    counts = pdf["c"].to_numpy(dtype=np.float64)
    return pd.DataFrame({
        "record_id": [record_id],
        "n_bins": [len(bins)],
        "tinn": [tinn_fit(bins, counts)],
    })


FREQ_SLIDING_SCHEMA = ("record_id long, ws_us long, n_beats long, "
                       "vlf double, lf double, hf double, "
                       "total_power double, lf_hf_ratio double, "
                       "lfnu double, hfnu double")


def freq_domain_window_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    """(key, pdf) form of freq_domain_kernel for per-(record, window)
    groups — the sliding/windowed frequency features (the production
    shape: bounded windows keep every Arrow group small, where
    per-record grouping would hand one giant series to one task at
    100 TB). Same resample→Welch→band-power math; window id carried
    through from the group key."""
    record_id, ws_us = key
    out = freq_domain_kernel(pdf.assign(record_id=record_id))
    out.insert(1, "ws_us", [ws_us])
    return out


# --- Detrended fluctuation analysis (DFA alpha1) ---------------------------

DFA_SCHEMA = "record_id long, n_beats long, dfa_alpha1 double"

DFA_BOXES = tuple(range(4, 17))  # short-term scales n = 4..16 beats


def dfa_alpha(x: np.ndarray, boxes=DFA_BOXES) -> float | None:
    """DFA short-term scaling exponent α1 (Peng et al.; nolds-style):
    integrate the mean-centered series, split into non-overlapping
    boxes of n beats, least-squares detrend each box, F(n) = RMS
    residual, α = slope of log F(n) vs log n. O(N·|boxes|) per series
    — vectorized over boxes via reshape, no Python inner loop over
    boxes' contents."""
    x = np.asarray(x, dtype=np.float64)
    n_total = len(x)
    if n_total < 2 * max(boxes):
        return None
    y = np.cumsum(x - x.mean())
    log_n, log_f = [], []
    for n in boxes:
        k = n_total // n
        if k < 2:
            continue
        seg = y[: k * n].reshape(k, n)
        t = np.arange(n, dtype=np.float64)
        tm = t - t.mean()
        denom = float((tm * tm).sum())
        slope = (seg * tm).sum(axis=1) / denom
        inter = seg.mean(axis=1)
        resid = seg - (inter[:, None] + slope[:, None] * tm)
        f = np.sqrt((resid ** 2).mean())
        if f > 0:
            log_n.append(np.log(n))
            log_f.append(np.log(f))
    if len(log_n) < 2:
        return None
    ln, lf = np.array(log_n), np.array(log_f)
    a = ((ln - ln.mean()) * (lf - lf.mean())).sum() / ((ln - ln.mean()) ** 2).sum()
    return float(a)


def dfa_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    record_id = pdf["record_id"].iloc[0]
    pdf = pdf.sort_values("beat_ts")
    rri = pdf["rri"].to_numpy(dtype=np.float64)
    return pd.DataFrame({"record_id": [record_id], "n_beats": [len(rri)],
                         "dfa_alpha1": [dfa_alpha(rri)]})


# --- Lomb-Scargle periodogram band powers ----------------------------------

LOMB_SCHEMA = ("record_id long, n_beats long, lf_lomb double, hf_lomb double, "
               "lf_hf_lomb double")


def lomb_power(t: np.ndarray, x: np.ndarray, freqs: np.ndarray) -> np.ndarray:
    """Classical normalized Lomb-Scargle periodogram (Press & Rybicki
    form), directly on the UNEVEN beat times — the physiologically
    faithful PSD for RR series (no resampling step, unlike Welch).
    Vectorized over the frequency grid: O(|freqs|·n) with numpy
    broadcasting, no Python loop over frequencies."""
    x = x - x.mean()
    var = x.var()
    if var == 0 or len(t) < 4:
        return np.zeros_like(freqs)
    w = 2.0 * np.pi * freqs[:, None]          # (F, 1)
    wt = w * t[None, :]                        # (F, n)
    tau = np.arctan2(np.sin(2 * wt).sum(axis=1),
                     np.cos(2 * wt).sum(axis=1)) / 2.0
    arg = wt - tau[:, None]
    c, s = np.cos(arg), np.sin(arg)
    xc = (x[None, :] * c).sum(axis=1)
    xs = (x[None, :] * s).sum(axis=1)
    cc = (c * c).sum(axis=1)
    ss = (s * s).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = 0.5 * (np.where(cc > 0, xc * xc / cc, 0.0)
                   + np.where(ss > 0, xs * xs / ss, 0.0)) / var
    return p


def lomb_band_powers(t_s: np.ndarray, rri: np.ndarray) -> tuple[float, float]:
    """LF/HF band powers from the Lomb periodogram on beat times in
    seconds; integrates normalized power over each band's grid."""
    df = 0.002
    freqs = np.arange(LF_BAND[0], HF_BAND[1], df)
    p = lomb_power(t_s, rri, freqs)
    lf_mask = (freqs >= LF_BAND[0]) & (freqs < LF_BAND[1])
    hf_mask = (freqs >= HF_BAND[0]) & (freqs < HF_BAND[1])
    lf = float(np.trapz(p[lf_mask], freqs[lf_mask]))
    hf = float(np.trapz(p[hf_mask], freqs[hf_mask]))
    return lf, hf


def lomb_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    record_id = pdf["record_id"].iloc[0]
    pdf = pdf.sort_values("beat_ts")
    rri = pdf["rri"].to_numpy(dtype=np.float64)
    out = {"record_id": [record_id], "n_beats": [len(rri)],
           "lf_lomb": [None], "hf_lomb": [None], "lf_hf_lomb": [None]}
    if len(rri) >= 16:
        t = np.cumsum(rri) / 1000.0
        t = t - t[0]
        lf, hf = lomb_band_powers(t, rri)
        out.update(lf_lomb=[lf], hf_lomb=[hf],
                   lf_hf_lomb=[lf / hf if hf > 0 else None])
    return pd.DataFrame(out)
