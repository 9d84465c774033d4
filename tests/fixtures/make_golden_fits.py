"""Generate golden FITS fixtures DIRECTLY from the FITS 4.0 standard —
deliberately sharing NO code with celeste_tpu.data.ingest.fits_lite, so the
reader is tested against an independent construction of the format rather
than its own writer (VERDICT r1 #7: de-circularize the ingest tests).

Run from the repo root to (re)generate:
    python tests/fixtures/make_golden_fits.py

Standard facts used (FITS Standard 4.0, sections 3.3/4.4/5/7.3):
- header = sequence of 80-char ASCII cards in 2880-byte blocks, ended by an
  END card, space-padded;
- fixed-format value cards: "KEYWORD = " then the value right-justified in
  columns 11-30 for numbers/logicals;
- image payload: big-endian, BITPIX sign convention, stored as
  physical = stored * BSCALE + BZERO; BZERO=32768 with BITPIX=16 is the
  standard unsigned-16-bit convention;
- binary table: NAXIS1 bytes per row, NAXIS2 rows, column f's layout from
  TFORMf (repeat + code), optional TSCALf/TZEROf scaling and TDIMf cell
  shape '(fastest,...,slowest)'.
"""

import os
import struct

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def card(text: str) -> bytes:
    assert len(text) <= 80, text
    return text.ljust(80).encode("ascii")


def kv(key: str, value: str, comment: str = "") -> bytes:
    s = f"{key:<8}= {value:>20}"
    if comment:
        s += f" / {comment}"
    return card(s)


def header(cards) -> bytes:
    raw = b"".join(cards) + card("END")
    pad = (-len(raw)) % 2880
    return raw + b" " * pad


def payload(raw: bytes) -> bytes:
    pad = (-len(raw)) % 2880
    return raw + b"\x00" * pad


def golden_unsigned16_image() -> bytes:
    """3x2 'uint16' image via the BZERO=32768 convention.

    Physical values (row-major, NAXIS2=2 rows of NAXIS1=3):
        [[0, 1, 40000], [65535, 32768, 12345]]
    Stored int16 = physical - 32768.
    """
    phys = [0, 1, 40000, 65535, 32768, 12345]
    stored = [p - 32768 for p in phys]
    h = header([
        kv("SIMPLE", "T"),
        kv("BITPIX", "16"),
        kv("NAXIS", "2"),
        kv("NAXIS1", "3"),
        kv("NAXIS2", "2"),
        kv("BSCALE", "1"),
        kv("BZERO", "32768", "unsigned 16-bit convention"),
    ])
    return h + payload(struct.pack(">6h", *stored))


def golden_scaled_float_image() -> bytes:
    """2x2 BITPIX=32 image with real BSCALE/BZERO scaling.

    stored = [[10, -20], [30, 0]], BSCALE=0.25, BZERO=100.0
    physical = stored*0.25 + 100 = [[102.5, 95.0], [107.5, 100.0]]
    """
    h = header([
        kv("SIMPLE", "T"),
        kv("BITPIX", "32"),
        kv("NAXIS", "2"),
        kv("NAXIS1", "2"),
        kv("NAXIS2", "2"),
        kv("BSCALE", "0.25"),
        kv("BZERO", "100.0"),
    ])
    return h + payload(struct.pack(">4i", 10, -20, 30, 0))


def golden_bintable() -> bytes:
    """Primary (no data) + BINTABLE extension with:
    - col 'ID':    TFORM 1J                      -> [7, 8, 9]
    - col 'TEMP':  TFORM 1I, TSCAL 0.01 TZERO 273.0
                   stored [-500, 0, 2650] -> physical [268.0, 273.0, 299.5]
    - col 'VEC':   TFORM 6E, TDIM '(3,2)'        -> [nrow, 2, 3] cells
    - col 'NAME':  TFORM 4A                      -> ['AB', 'CDE', 'FGHI']
    """
    prim = header([kv("SIMPLE", "T"), kv("BITPIX", "8"), kv("NAXIS", "0")])
    nrow = 3
    rowbytes = 4 + 2 + 6 * 4 + 4
    h = header([
        card("XTENSION= 'BINTABLE'"),
        kv("BITPIX", "8"),
        kv("NAXIS", "2"),
        kv("NAXIS1", str(rowbytes)),
        kv("NAXIS2", str(nrow)),
        kv("PCOUNT", "0"),
        kv("GCOUNT", "1"),
        kv("TFIELDS", "4"),
        card("TTYPE1  = 'ID'"),
        card("TFORM1  = '1J'"),
        card("TTYPE2  = 'TEMP'"),
        card("TFORM2  = '1I'"),
        kv("TSCAL2", "0.01"),
        kv("TZERO2", "273.0"),
        card("TTYPE3  = 'VEC'"),
        card("TFORM3  = '6E'"),
        card("TDIM3   = '(3,2)'"),
        card("TTYPE4  = 'NAME'"),
        card("TFORM4  = '4A'"),
    ])
    ids = [7, 8, 9]
    temps = [-500, 0, 2650]
    vecs = [[float(r * 10 + c) for c in range(6)] for r in range(nrow)]
    names = [b"AB  ", b"CDE ", b"FGHI"]
    rows = b""
    for r in range(nrow):
        rows += struct.pack(">i", ids[r])
        rows += struct.pack(">h", temps[r])
        rows += struct.pack(">6f", *vecs[r])
        rows += names[r]
    assert len(rows) == nrow * rowbytes
    return prim + h + payload(rows)


def golden_boss_spec() -> bytes:
    """A miniature spec-PLATE-MJD-FIBER.fits per the SDSS-III data model:
    primary + COADD bintable (FLUX/LOGLAM/IVAR/AND_MASK, one row per pixel)
    + one-row SPALL bintable (Z/ZWARNING/CLASS).

    64 pixels, loglam from log10(3800) step 1e-4 (the BOSS constant);
    flux = 5 + a gaussian emission line at pixel 32, ivar = 4 except
    pixels 10 (ivar 0) and 20 (AND_MASK set); Z = 2.5, CLASS = 'QSO'.
    """
    npix = 64
    loglam0 = 3.5797835966168101  # log10(3800.0)
    loglam = [loglam0 + 1e-4 * i for i in range(npix)]
    flux = [5.0 + 10.0 * 2.718281828459045 ** (-0.5 * ((i - 32) / 3.0) ** 2)
            for i in range(npix)]
    ivar = [4.0] * npix
    ivar[10] = 0.0
    and_mask = [0] * npix
    and_mask[20] = 2 ** 16      # e.g. BRIGHTSKY

    prim = header([kv("SIMPLE", "T"), kv("BITPIX", "8"), kv("NAXIS", "0")])
    rowbytes = 4 + 4 + 4 + 4
    coadd = header([
        card("XTENSION= 'BINTABLE'"),
        kv("BITPIX", "8"), kv("NAXIS", "2"),
        kv("NAXIS1", str(rowbytes)), kv("NAXIS2", str(npix)),
        kv("PCOUNT", "0"), kv("GCOUNT", "1"), kv("TFIELDS", "4"),
        card("EXTNAME = 'COADD'"),
        card("TTYPE1  = 'FLUX'"), card("TFORM1  = '1E'"),
        card("TTYPE2  = 'LOGLAM'"), card("TFORM2  = '1E'"),
        card("TTYPE3  = 'IVAR'"), card("TFORM3  = '1E'"),
        card("TTYPE4  = 'AND_MASK'"), card("TFORM4  = '1J'"),
    ])
    rows = b""
    for i in range(npix):
        rows += struct.pack(">fffi", flux[i], loglam[i], ivar[i], and_mask[i])
    coadd += payload(rows)

    spall = header([
        card("XTENSION= 'BINTABLE'"),
        kv("BITPIX", "8"), kv("NAXIS", "2"),
        kv("NAXIS1", str(4 + 4 + 6)), kv("NAXIS2", "1"),
        kv("PCOUNT", "0"), kv("GCOUNT", "1"), kv("TFIELDS", "3"),
        card("EXTNAME = 'SPALL'"),
        card("TTYPE1  = 'Z'"), card("TFORM1  = '1E'"),
        card("TTYPE2  = 'ZWARNING'"), card("TFORM2  = '1J'"),
        card("TTYPE3  = 'CLASS'"), card("TFORM3  = '6A'"),
    ])
    spall += payload(struct.pack(">fi", 2.5, 0) + b"QSO   ")
    return prim + coadd + spall


def main():
    for name, data in [
        ("golden_unsigned16.fits", golden_unsigned16_image()),
        ("golden_scaled.fits", golden_scaled_float_image()),
        ("golden_table.fits", golden_bintable()),
        ("golden_boss_spec.fits", golden_boss_spec()),
    ]:
        with open(os.path.join(OUT_DIR, name), "wb") as fh:
            fh.write(data)
        print(f"wrote {name} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
