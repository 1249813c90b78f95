"""Extract the concave "complex" floe polygons from the reference test
fixture ``test/test_conservation/FloeShapes.mat``.

The fixture stores a 1x462 MATLAB ``polyshape`` array named ``poly`` as an
MCOS opaque object (scipy cannot load those directly).  The vertex data lives
in the embedded ``__function_workspace__`` MAT5 stream: variable 1 is the
``FileWrapper__`` whose cell entries [2..] are the per-object property structs
in object-id order, and the top-level opaque's metadata lists object ids
1..462 in order — so ``poly(k)``'s vertices are FileWrapper entry ``k+1``.

``conservation_test.m:15-17`` uses ``complex1 = poly(5)`` and
``complex2 = translate(poly(4), -[1e4 4e4])``; we save the raw (untranslated)
vertex arrays as .npy fixtures for tests/test_golden.py.

Usage:  python tools/extract_floeshapes.py
"""

from __future__ import annotations

import io
from pathlib import Path

import numpy as np
import scipy.io as sio
from scipy.io.matlab._mio5 import MatFile5Reader

REF = Path("/root/reference/test/test_conservation/FloeShapes.mat")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def load_polyshapes(path=REF) -> list[np.ndarray]:
    d = sio.loadmat(str(path))
    ws = d["__function_workspace__"].tobytes()
    s = io.BytesIO(ws)
    rdr = MatFile5Reader(s)
    rdr.byte_order = "<"
    rdr.initialize_read()
    s.seek(8)  # skip the workspace mini-header
    hdr, _ = rdr.read_var_header()
    fw = rdr.read_var_array(hdr)
    arr = fw[0, 0][0]["arr"][0]  # FileWrapper__ cell entries
    polys = []
    for i in range(2, arr.shape[0] - 2):
        st = arr[i, 0]
        if st.dtype.names and "Vertices" in st.dtype.names:
            polys.append(np.asarray(st["Vertices"][0, 0], dtype=np.float64))
    return polys


def main() -> None:
    polys = load_polyshapes()
    OUT.mkdir(exist_ok=True)
    # poly(k) -> polys[k-1]
    np.save(OUT / "floeshapes_poly4.npy", polys[3])
    np.save(OUT / "floeshapes_poly5.npy", polys[4])
    print("poly4", polys[3].shape, "poly5", polys[4].shape)


if __name__ == "__main__":
    main()
