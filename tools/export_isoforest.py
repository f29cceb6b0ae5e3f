#!/usr/bin/env python3
"""One-time export of the reference's IsolationForest artifact to a JSON
sidecar the Scala scorer can load.

The artifact (`/root/reference/function-app/anomaly_isoforest.pkl`) is a
joblib numpy-pickle: a pickle stream with raw ndarray bytes interleaved
after each NumpyArrayWrapper object. The container has no joblib or
sklearn, so this reimplements the (public, BSD) wrapper-read protocol on
top of `pickle._Unpickler` and stubs the sklearn classes, capturing
their state. Only model PARAMETERS are extracted (scaler mean/scale,
per-tree node arrays, offset) — the WHAT, not any reference code.
"""
import json
import pickle
import struct
import sys

import numpy as np


class SkStub:
    def __init__(self, *a, **k):
        self._args = a

    def __setstate__(self, state):
        self._state = state
        if isinstance(state, dict):
            self.__dict__.update(state)


class ArrayWrapper:
    """Stands in for joblib.numpy_pickle.NumpyArrayWrapper: after BUILD,
    reads the raw array bytes that follow in the stream."""

    def __setstate__(self, state):
        self.__dict__.update(state)

    def read(self, fh):
        align = getattr(self, "numpy_array_alignment_bytes", None)
        dtype = self.dtype
        if dtype.hasobject:
            return pickle.load(fh)  # object arrays are nested plain pickles
        if align:
            pad = int.from_bytes(fh.read(1), "little")
            if pad:
                fh.read(pad)
        count = int(np.prod(self.shape)) if self.shape else 1
        data = fh.read(count * dtype.itemsize)
        arr = np.frombuffer(data, dtype=dtype)
        return arr.reshape(self.shape, order=getattr(self, "order", "C"))


made = {}


class JoblibUnpickler(pickle._Unpickler):
    dispatch = pickle._Unpickler.dispatch.copy()

    def find_class(self, module, name):
        if name in ("NumpyArrayWrapper", "NDArrayWrapper"):
            return ArrayWrapper
        if module.startswith(("numpy",)):
            return super().find_class(module, name)
        key = f"{module}.{name}"
        if key not in made:
            made[key] = type(name, (SkStub,), {"_qual": key, "__module__": module})
        return made[key]

    def load_build(self):
        pickle._Unpickler.load_build(self)
        if isinstance(self.stack[-1], ArrayWrapper):
            self.stack[-1] = self.stack[-1].read(self._file)

    # _Unpickler dispatches through this table, not attribute lookup —
    # without this line the override never runs.
    dispatch[pickle.BUILD[0]] = load_build


def load(path):
    with open(path, "rb") as f:
        u = JoblibUnpickler(f)
        u._file = f
        return u.load()


def main():
    obj = load("/root/reference/function-app/anomaly_isoforest.pkl")
    assert obj["sklearn_version"] == "1.2.2", obj.get("sklearn_version")
    pipe = obj["model"]
    steps = dict(pipe.steps)
    scaler, iso = steps["scaler"], steps["iforest"]

    mean = np.asarray(scaler.mean_).tolist()
    scale = np.asarray(scaler.scale_).tolist()
    feature_names = [str(x) for x in np.asarray(scaler.feature_names_in_)]

    trees = []
    for est in iso.estimators_:
        nodes = est.tree_._state["nodes"] if isinstance(est.tree_._state, dict) \
            else est.tree_.nodes
        trees.append({
            "left": nodes["left_child"].astype(int).tolist(),
            "right": nodes["right_child"].astype(int).tolist(),
            "feature": nodes["feature"].astype(int).tolist(),
            "threshold": nodes["threshold"].tolist(),
            "n_node_samples": nodes["n_node_samples"].astype(int).tolist(),
        })

    out = {
        "sklearn_version": "1.2.2",
        "feature_names": feature_names,
        "scaler_mean": mean,
        "scaler_scale": scale,
        "n_estimators": len(trees),
        "max_samples": int(iso.max_samples_),
        "offset": float(iso.offset_),
        "contamination": float(iso.contamination),
        "trees": trees,
    }
    with open("src/main/resources/isoforest_model.json", "w") as f:
        json.dump(out, f)
    print("features:", feature_names)
    print("scaler mean:", mean)
    print("scaler scale:", scale)
    print("n_trees:", len(trees), "max_samples:", out["max_samples"],
          "offset:", out["offset"], "contamination:", out["contamination"])
    sizes = sorted(len(t["left"]) for t in trees)
    print("node counts min/med/max:", sizes[0], sizes[len(sizes)//2], sizes[-1])


if __name__ == "__main__":
    sys.exit(main())
