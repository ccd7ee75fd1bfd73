"""Ground-truth fixture generator for the superluminous XGBoost model.

Parses the XGBoost-UBJSON booster embedded in the reference's
superluminous_classifier.joblib with a hand-rolled UBJSON reader and
evaluates predict_proba in NumPy, independently of the Scala
implementation (models/XgbUbjson.scala). Run offline; output is pinned
by XgbUbjsonSpec.

Usage: python3 tools/slsn_xgb_fixture.py <joblib> <out.json>
"""
import io, json, pickle, struct, sys
import numpy as np


def unpickle_with_stubs(path):
    class Stub:
        def __setstate__(self, state):
            self.__dict__.update(state if isinstance(state, dict) else {"_state": state})

    class U(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith('numpy'):
                import numpy
                mod = numpy
                for part in module.split('.')[1:]:
                    mod = getattr(mod, part)
                return getattr(mod, name)
            if module == 'builtins':
                import builtins
                return getattr(builtins, name)
            return type(name, (Stub,), {'__module__': module})

    with open(path, 'rb') as f:
        return U(f).load()


class Ubj:
    def __init__(self, b):
        self.b = b
        self.i = 0

    def marker(self):
        c = self.b[self.i:self.i + 1]
        self.i += 1
        return c

    def length(self):
        return self.value(self.marker())

    def value(self, m):
        b, i = self.b, self.i
        if m == b'i':
            self.i += 1
            return struct.unpack('>b', b[i:i + 1])[0]
        if m == b'U':
            self.i += 1
            return b[i]
        if m == b'I':
            self.i += 2
            return struct.unpack('>h', b[i:i + 2])[0]
        if m == b'l':
            self.i += 4
            return struct.unpack('>i', b[i:i + 4])[0]
        if m == b'L':
            self.i += 8
            return struct.unpack('>q', b[i:i + 8])[0]
        if m == b'd':
            self.i += 4
            return np.float32(struct.unpack('>f', b[i:i + 4])[0])
        if m == b'D':
            self.i += 8
            return struct.unpack('>d', b[i:i + 8])[0]
        if m == b'S':
            n = self.length()
            v = self.b[self.i:self.i + n].decode()
            self.i += n
            return v
        if m == b'T':
            return True
        if m == b'F':
            return False
        if m == b'Z':
            return None
        if m == b'{':
            return self.obj()
        if m == b'[':
            return self.arr()
        raise ValueError(f'marker {m} at {i}')

    def obj(self):
        o = {}
        while self.b[self.i:self.i + 1] != b'}':
            n = self.length()
            k = self.b[self.i:self.i + n].decode()
            self.i += n
            o[k] = self.value(self.marker())
        self.i += 1
        return o

    def arr(self):
        t = None
        n = None
        if self.b[self.i:self.i + 1] == b'$':
            self.i += 1
            t = self.marker()
        if self.b[self.i:self.i + 1] == b'#':
            self.i += 1
            n = self.length()
        if t is not None:
            spec = {b'd': ('f4', 4), b'D': ('f8', 8), b'l': ('i4', 4),
                    b'L': ('i8', 8), b'i': ('i1', 1), b'U': ('u1', 1),
                    b'I': ('i2', 2)}[t]
            out = np.frombuffer(self.b[self.i:self.i + n * spec[1]],
                                dtype='>' + spec[0]).astype(spec[0])
            self.i += n * spec[1]
            return out
        out = []
        while True:
            if n is None and self.b[self.i:self.i + 1] == b']':
                self.i += 1
                return out
            if n is not None and len(out) == n:
                return out
            out.append(self.value(self.marker()))


def main(joblib_path, out_path):
    clf = unpickle_with_stubs(joblib_path)
    raw = bytes(clf._Booster.handle)
    p = Ubj(raw)
    top = p.value(p.marker())
    learner = top['Model']['learner']
    feature_names = list(learner['feature_names'])
    base_score = float(learner['learner_model_param']['base_score'])
    trees = learner['gradient_booster']['model']['trees']
    nfeat = len(feature_names)

    def margin(x):
        x32 = np.asarray(x, dtype=np.float32)
        m = np.log(base_score / (1.0 - base_score))  # ProbToMargin
        for t in trees:
            lc = np.asarray(t['left_children'])
            rc = np.asarray(t['right_children'])
            si = np.asarray(t['split_indices'])
            sco = np.asarray(t['split_conditions'], dtype=np.float32)
            dl = np.asarray(t['default_left'])
            node = 0
            while lc[node] != -1:
                f = x32[si[node]]
                if np.isnan(f):
                    node = lc[node] if dl[node] else rc[node]
                else:
                    node = lc[node] if f < sco[node] else rc[node]
            m += float(sco[node])
        return m

    rng = np.random.RandomState(20260812)
    cases = []
    for k in range(64):
        # spread across the observed threshold ranges; inject NaNs to
        # exercise default_left routing
        x = rng.uniform(-10, 10, nfeat) * (10.0 ** rng.randint(-2, 4, nfeat))
        if k % 4 == 1:
            x[rng.randint(0, nfeat)] = np.nan
        if k % 16 == 2:
            x[:] = np.nan
        m = margin(x)
        p = 1.0 / (1.0 + np.exp(-m))
        cases.append({
            'x': [None if np.isnan(v) else float(v) for v in x],
            'margin': m,
            'proba': p,
        })

    fixture = {
        'feature_names': feature_names,
        'base_score': base_score,
        'num_trees': len(trees),
        'total_nodes': int(sum(len(t['left_children']) for t in trees)),
        'optimal_threshold': float(clf.optimal_threshold),
        'cases': cases,
    }
    with open(out_path, 'w') as f:
        json.dump(fixture, f)
    print('wrote', out_path, 'trees', len(trees), 'nodes', fixture['total_nodes'],
          'threshold', fixture['optimal_threshold'])


if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
