"""Independent HG phase-curve fits for the 3-object SSOFT fixture.

For each object and ZTF band, fits the Bowell HG model to
(phase, reduced magnitude) with a method unrelated to the engine's
Gauss-Newton: a fine grid over G with the exact weighted-least-squares
H at each G (the model is linear in H once G is fixed), then parabolic
refinement. Output pinned by SsoftSpec.

Usage: python3 tools/ssoft_hg_fixture.py <fixture.parquet> <out.json>
"""
import json
import sys
import numpy as np
import pyarrow.parquet as pq


def hg_phi(alpha):
    t = np.tan(alpha / 2.0)
    return np.exp(-3.33 * t ** 0.63), np.exp(-1.87 * t ** 1.22)


def chi2_of(G, alpha, m, w):
    p1, p2 = hg_phi(alpha)
    base = -2.5 * np.log10((1 - G) * p1 + G * p2)
    # optimal H for this G: weighted mean of (m - base)
    H = np.sum(w * (m - base)) / np.sum(w)
    r = m - (H + base)
    return float(np.sum(w * r * r)), float(H)


def fit_band(alpha, m, sigma):
    w = 1.0 / sigma ** 2
    grid = np.linspace(0.0, 1.0, 2001)
    chis = np.array([chi2_of(g, alpha, m, w)[0] for g in grid])
    k = int(np.argmin(chis))
    # parabolic refine (interior minima)
    if 0 < k < len(grid) - 1:
        a, b, c = chis[k - 1], chis[k], chis[k + 1]
        denom = a - 2 * b + c
        G = grid[k] + (0.5 * (a - c) / denom if denom > 0 else 0.0) * (grid[1] - grid[0])
        G = min(max(G, 0.0), 1.0)
    else:
        G = grid[k]
    chi2, H = chi2_of(G, alpha, m, w)
    dof = max(len(m) - 2, 1)
    return H, G, chi2 / dof


def main(fixture, out_path):
    df = pq.read_table(fixture).to_pandas()
    out = {}
    for _, row in df.iterrows():
        mag = np.asarray(row['cmagpsf'], dtype=float)
        sig = np.asarray(row['csigmapsf'], dtype=float)
        fid = np.asarray(row['cfid'], dtype=int)
        phase = np.asarray(row['Phase'], dtype=float)
        dobs = np.asarray(row['Dobs'], dtype=float)
        dhelio = np.asarray(row['Dhelio'], dtype=float)
        mred = mag - 5.0 * np.log10(dobs * dhelio)
        bands = {}
        for b in (1, 2):
            sel = (fid == b) & np.isfinite(mag) & np.isfinite(sig) & np.isfinite(phase)
            if sel.sum() < 3:
                continue
            H, G, chi2red = fit_band(np.radians(phase[sel]), mred[sel], sig[sel])
            bands[str(b)] = {'h': H, 'g': G, 'chi2red': chi2red,
                             'n': int(sel.sum())}
        out[str(row['ssnamenr'])] = bands
    with open(out_path, 'w') as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
