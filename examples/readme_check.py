"""Run every README quick-start snippet verbatim on the current backend.

On a TPU machine this exercises the compiled Pallas path end-to-end (the
CPU test suite runs the same snippets in interpret mode with a truncated
corpus, tests/test_readme.py).  Exits non-zero on any failure.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import ryg_rans_tpu as rt  # noqa: E402


def main():
    raw = open("/root/reference/book1", "rb").read()

    blob = rt.compress(raw)
    data = rt.decompress(blob)
    assert data == raw, "default-config round-trip failed"
    print(f"default config: {len(raw)} -> {len(blob)} bytes, round-trip ok")

    cfg = rt.RansConfig(variant=rt.Variant.ALIAS, prob_bits=16, n_lanes=8192)
    blob = rt.compress(data, cfg, backend="tpu")
    assert rt.decompress(blob) == raw, "ALIAS tpu round-trip failed"
    print(f"README ALIAS config (tpu backend): {len(raw)} -> {len(blob)} "
          "bytes, round-trip ok")


if __name__ == "__main__":
    main()
