"""poc/ntt-cuda analogue: drive the NTT facade exactly like the reference's
Rust wrappers (NTT/iNTT/coset_NTT/coset_iNTT, poc/ntt-cuda/src/lib.rs:20-118).

Run: python examples/ntt_example.py [field] [lg]
"""

import sys

import numpy as np

from sppark_tpu import ntt
from sppark_tpu.params import get_field


def main():
    field = sys.argv[1] if len(sys.argv) > 1 else "goldilocks"
    lg = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    params = get_field(field)
    n = 1 << lg
    rng = np.random.default_rng(1)

    if field == "goldilocks":
        data = rng.integers(0, params.modulus, size=n, dtype=np.uint64)
    elif params.bits <= 32:
        data = rng.integers(0, params.modulus, size=n,
                            dtype=np.int64).astype(np.uint32)
    else:
        raise SystemExit("use a narrow field for this example")

    fwd = ntt.ntt(field, data, lg)                      # NN forward
    back = ntt.intt(field, fwd, lg)                      # NN inverse
    assert np.array_equal(np.asarray(back), np.asarray(data))
    print(f"{field} 2^{lg}: iNTT(NTT(x)) == x")

    cf = ntt.coset_ntt(field, data, lg)
    cb = ntt.coset_intt(field, cf, lg)
    assert np.array_equal(np.asarray(cb), np.asarray(data))
    print(f"{field} 2^{lg}: coset round-trip OK")

    ext = ntt.lde(field, data, lg, 2)                    # blowup 4x
    print(f"LDE: {n} evaluations -> {len(ext)} over the shifted coset")


if __name__ == "__main__":
    main()
