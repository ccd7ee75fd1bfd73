"""Ground truth for KnPcSpec: per-band PC1 least-squares projections of
a deterministic synthetic curve, computed in NumPy independently of the
Scala npy/pickle readers.

Usage: python3 tools/kn_pc_fixture.py <KN_PC_all_bands.npy> <out.json>
"""
import json
import sys
import numpy as np


def main(npy_path, out_path):
    d = np.load(npy_path, allow_pickle=True).item()
    # synthetic normalized light curve on the 51-bin PC grid: a bump
    # peaking at bin 27 (the per-band PC1 maximum region)
    i = np.arange(51)
    f = np.exp(-((i - 27.0) / 6.0) ** 2)
    out = {'bands': {}}
    for band, M in sorted(d.items()):
        pc1 = M[0]
        coeff = float(np.dot(pc1, f) / np.dot(pc1, pc1))
        resid = f - coeff * pc1
        out['bands'][band] = {
            'shape': list(M.shape),
            'pc1_head': [float(x) for x in pc1[:5]],
            'coeff': coeff,
            'resid_rms': float(np.sqrt(np.mean(resid ** 2))),
        }
    with open(out_path, 'w') as fh:
        json.dump(out, fh)
    print('wrote', out_path, 'bands', sorted(d.keys()))


if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
