"""Pure-numpy VP8 intra-frame (keyframe) codec: lossy WebP decode + encode.

This closes the last documented raster-codec boundary (DEVIATIONS.md "other
media codecs"): lossy WebP files carry exactly one VP8 key frame, so an
intra-only implementation decodes every lossy WebP.  Everything here is
transcribed from the public RFC 6386 ("VP8 Data Format and Decoding Guide"):

- boolean arithmetic coder            RFC 6386 section 7
- frame / macroblock header layout    RFC 6386 sections 9-11
- DCT/WHT token decoding + dequant    RFC 6386 sections 13-14
- inverse transforms                  RFC 6386 section 14.3
- intra prediction (16x16/8x8/4x4)    RFC 6386 sections 12.2-12.3
- loop filter (normal + simple)       RFC 6386 section 15

The default probability / quantizer tables (`_TABLES_B85`) are the RFC 6386
constants (sections 13.4-13.5 token probabilities and updates, 11.4 key-frame
b-mode probabilities, 14.1 dequantization lookups); the byte blob was
verified byte-identical against the system libwebp's .rodata so that no
transcription typo can silently break real-stream interop.  Tests
(tests/test_vp8.py) prove two-way interop against libwebp via ctypes:
libwebp-encoded streams decode here byte-exactly at the YUV level, and
streams produced by `encode_vp8_frame` decode in libwebp.

Spark-side use: like the JPEG/PNG/GIF codecs, VP8 work is per-row CPU inside
Arrow-batched mapInPandas (operators/images.py) - payload bytes never leave
the scanning executor, so the pattern holds at 100 TB.
"""

from __future__ import annotations

import base64
import struct

import numpy as np

# ---------------------------------------------------------------------------
# constant tables (RFC 6386; byte-verified against libwebp 7.1.5)
# layout: ac_q uint16[128] | dc_q uint8[128] | coeff_update_probs[4][8][3][11]
#         | kf_bmode_probs[10][10][9] | coeff_probs[4][8][3][11]
# ---------------------------------------------------------------------------

_TABLES_B85 = (
    "1ONp91^@>D2mlEH3IGcL3;+!P4ge1T5C9PX5&#nb6aW<f762Cj7yuan8UPyr8~_~v9snNzAOIl%A"
    "^;-*BmgA<CIBY@C;%w{DgY}0EC4M4E&wk8FaR+CG5|9GGypXKHUKvOH~={SIsiNXJ^(-fLI6YnMg"
    "T|vN&rj%P5@8<QUFu{RsdK4S^!)CUI1VKVgO_SW&mgaY5;5iZUArqasYGycK~_-eE@&}g8+sAi2#"
    "fMj{uSYl>nFkn*g2wp#Y=+rvRz|tpKqAwE(#Qy#T=g#Q@0w%>dB=)d1N5-2mYL<pAmc?*R1x`2hX"
    "^0|5vD4FM7X7Xcgr1O)~M2nh-b3k(eo4-gR%5)%{@6%`g17Z(^A85$cL9UdPbAtECrB_$>&C@Cr{"
    "EG;fBFEBAOGc+|eH#j*uJ3Ku;KR`i3LqtVJM@UIZOH52nPESx#Qd3k_R##YATU}pZVq|4zXliV3a"
    "B_5ZdVGF>f`o>Mij0qul$V;F|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|FHJ||NsC0|N"
    "sC0-|_ta|NsC0|NsB_{r&&{|NsC0|NsB={Qv*||NsC0|LXq!|NsC0|NsC0{r~^}|NsC0|NsC0_Wu"
    "9>|NsC0|Nrm({{R2~|NsC0|Nj5}|NsC0|NsC0|M>p@|NsC0|NsB{|Nj5~|NsC0|NsC0|NsC0|NsC"
    "0|Ns5||NsC0|NsC0`~Lp_|NsC0|NsB~|Nj5~|NsC0|NsB~{r~>||NsC0|N8&_|Nj5~|NsC0{{R2~"
    "|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0+5i9l|NsC0|NsBt{PF$&|Nj5~|"
    "NrXx@%sJ${r>;||Ns8~|NsC0|NsC0-~Rsp|NsC0|NsB){r>*{|NsC0|NsB^{{R2~|NsC0|M~v^|N"
    "sC0|NsC0|NsC0|NsC0|NsC0{r~^}|NsC0|Nr;?|NsC0|NsC0|NsC0|NsC0|NsC0|NZ{||NsC0|Ns"
    "B||NsC0|NsC0|NsC0|NsC0|NsC0|Ns8}|NsC0|NsC0{r~^}|NsC0|NsC0|NsC0|NsC0|NsB~{r~^"
    "}|NsC0|N8&`|NsC0|NsC0{{R2~|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0"
    "y8HV7|NsC0|NsB$`}F?*|NsC0|Nr~@^Zow+{{R2~|Ns5||NsC0|NsC0?EU`#|NsC0|NsB{{r&#_|"
    "NsC0|NsB~{{R2~|NsC0|Nj2||NsC0|NsC0|NsC0|NsC0|NsC0{{R2~|NsC0|Ns8}|NsC0|NsC0|N"
    "j5~|NsC0|NsC0|NsC0|NsC0|NsB~|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|Ns"
    "C0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC0|NsC"
    "0|NsC0|NsC0|NsC0|NsC0|NsC0`2YX^|NsC0|NsB`{`~&`|NsC0|Nr>@`ThU@|NsC0|Ns5{|NsC0"
    "|NsC0_Wk|;|NsC0|NsB|{`>y^|NsC0|NsB~{Qv*||NsC0|M>p>|NsC0|NsC0{r~>{|NsC0|NsC0`"
    "~Ls`|NsC0|Nr&-{{R2~|NsC0|NZ^`|NsC0|NsC0|NH&_|NsC0|NsB|{r>;||NsC0|NsB~|NsC0|N"
    "sC0|Ns2||NsC0|NsC0`Tzd^|NsC0|NsC0|Nj5~|NsC0|NsC0{r~^}|NsC0|N8&`|NsC0|NsC0|Ns"
    "C0|NsC0|NsC0|NsC0|NsC0|Ns8~|NsC0|NsC0|NsC0|NsC0|NsC0=Xfw#b8&c>aG0||eyVmZMqjT"
    "*k5E-oNSkLkItr`Wy%7zVavBk%EW;HFt$7$w!x}y;Kvj@O3MQ-7kRlqYE;kd1pdrpjKNJXZa?lJ3"
    ";!!9IV762p5G01TS&3q0YNeD&yJUi$Zy-xhLT0C9N<Jv+fGITzvhj@?2y03!8j?w-F&CXdCTXBEG"
    "#_(-Xip3q+5cA&2UkQ#EOIjsx)(1g4sN!$6%oQhEg5FTy%!P|SXh&mDlRR=%`0KIbyX%Kvppv@$X"
    "6N_E9k2@A~R@mW*uEkCmdC)I;C1-Kq3}&&KDvprb%lyAR03PQ7a!r8EO_lt0duaA`=y6guD<;d_E"
    "FRUsX9WFf+krBcIoASuSrplpn0y<P{QcaB)plv;QV|awsYR#P!h%8EsfA9gL>cB`caeKOUPyEkps"
    ")WKakzngKH!M~+TT5dVN8#j7bO1!mK?1OeSMG7+fJz!w=(iXSAa8>S{K<wI9GsZw(qJF`DKTC_W+"
    "T}hfKC>3;%(IO|WFAos6BHuABw=NMOw+3PlAh$U#78rm5HW4L3AW3r^fER$xC<6&|Gr$rC-&Z9Gb"
    "308y6)$KvEZPY+HG<+mT1L$%DHj?!HaT#(1t}(`)gB@mg_v{-AciLsHQgF=AW8op2|?-t4*_;bOC"
    "St0!2h5tGgu!ZLuOSsx>Yz87jHYwEhWG=CPsWoW&t8%ePSwDXjOHuQeRXxS%745Wi3ljdoMG9QL6"
    "zt5d}wPIW;LUCLs-ZIY}A;RVfNXicM}>FLHAg0t#mTrWXcf9S{mtfMvuQIT8wHX4N7TD|HkPB%^>"
    "t0UBmKM<pUPAM?OPJVz!;cO2d&L@j_K0WS;nt3DAEMv_%GK1L-gC7NWTRiFVs30#OAKp@FgOAiSN"
    "K>xUR5LN~p1wj89_yITw5rm2VH*|nH4-`^|IU0E=q%t3gnuQr7+B0V?gM)h?2A)<ZK!=pzEw_Lc8"
    "WDr=nhpWcEf5u3K;8!d#W)own>>maX4O*+4K~34L@yjw8dX(*fFP2q5(@`EkgEg)_9Gh#lCG-^8i"
    "2k~BV)8sel{&telJ(BGbt1xWlMmIc9L{}RX8aRu<TVO2|h<25qEa~5fX}JCOnEaMk^YQk|YxztN&"
    "pe6pAf9KHC9Nyg(o+6m^%56cwXz6AV4WfG`9YfPjF2fPjF2fPjF2fPjF2fPjF2fPjF2fPjF2fPjF"
    "2fc=R6|K!_%fPjF2y@B%o<JJG$fPjE%e&hVs(f|K|fPevF`2XzU|Nnr1fVGA0{@v>Tnt*_SPKL_&"
    "#<c(2fPjDjx%vO||A2sifPlD`_y6qRfPjF2fK6`L|Lo>~fPjF20cHFD@&AB;fPjFii}C#I(f|K|f"
    "Pf`*#Pj6;|Nnr1fC0?@|MmZXfPjF2&!GDM?tp-RfPjEzXXpRZtAK!jfPev*{QvO(fPjF2fU$@3|L"
    "Wm@fPjF2P=V9`!r*{_fPjDj0snx2fPjF2fPnS^|A2sifPjF2fd7DifPjF2fPjF2#v|?D!MmcMk()"
    "k)Eymrfu-u*e-2p@|lF*f>-J<{BfB}{9|J~sK|A2sixQ*)l-rWDkfPjEeW3}?IzWK`k|9}C3=>68"
    "k^2GoDfMa>m`pL%s%7B1?7h9w9s=N2n|Nnpi$oBv0|A2sifPihX@&D)b|Nnr1fGmQ^{msDt|A2si"
    "0fg`S+tL4}fPjErh~fL%zW@J#fPfZcuJyX1|HpuUfC0Ao|LE(0fPjF2e2?+}<LZEbfPjD_O||>M)"
    "BnwYfPev=_y6qY|Nnr1fO(DU|Ka2R|A2siEn~d<!`c7ffPjDj0sH^e|A2sifPl*Z`2YWafPjF2fQ"
    "bRI|KR_CfPjF2{R#N{&(QzCfPjFn4dC;^x%tNb|A0vmtKFfq?5F?gfB|3k{nWSr|A2si?^^Ww)6x"
    "I`fPjFTO~d%S!~g$)fPeuQ@B7-@|IL7afXOr4|HQh0fPjF2MJ~SY$=d(qfPjDjzx)6HfPjF2fPmk"
    "n`Ty1bfPjF2fQ@|k|Nnr1fPjF20TB5A|A2sifPjF$B<BC@|A2sifPj?&|A2sifPjF2fC1wFfPjF2"
    "fPjF2_rU*vfPjF2fPjGTfd7DifPjF2fPevp{Qv)efPjF2fYm<w|Nnr1fPjF2H(mdLfPjF2fPjF2f"
    "PjF2fPjF2fPjF2fPjF2fPjF2fPjF2fPjF2fPjF2${5w_y1(3@@UQ=VCbsCQxa6+?yMR3|irbg6@T"
    "&jVfB|sk`p3Wbpa1`WrfuZ>)7Ss5fPjD}O`_<mwDq$8|9}BB-1f%D`P~2ifP6~7^S8nJ-T(i97)O"
    "HJnyT}*|Nnpiw&D5P@c-a|fPj^j;{4dn|Eqw2fE;Y9^0&hN-~a!B0a51s%*+44fPjE|X3_V&#Q*7"
    "lfPfTVne(Kr|I2`YfC1k4|Jc=lfPjF2sIT_?>&^fFfPjE6bl3mW)c^m0fPevc?ETc%|Nnr1fQ?ku"
    "{K?Ay+kk+8Do~*CqPhRgfPjDj0snx2fPjF2fPnM?|A2sifPjF2fbIeRfPjF2fPjF2"
)

_BLOB = base64.b85decode(_TABLES_B85)
AC_QLOOKUP = np.frombuffer(_BLOB[0:256], dtype="<u2").astype(np.int32)
DC_QLOOKUP = np.frombuffer(_BLOB[256:384], dtype=np.uint8).astype(np.int32)
COEFF_UPDATE_PROBS = np.frombuffer(_BLOB[384:1440], dtype=np.uint8) \
    .reshape(4, 8, 3, 11)
KF_BMODE_PROBS = np.frombuffer(_BLOB[1440:2340], dtype=np.uint8) \
    .reshape(10, 10, 9)
COEFF_PROBS = np.frombuffer(_BLOB[2340:3396], dtype=np.uint8) \
    .reshape(4, 8, 3, 11)

# coefficient-position -> probability band (RFC 6386 13.3)
KBANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7, 0)
# zigzag scan order (RFC 6386 13.5)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# token extra-bits categories: (base value, per-bit probabilities)
_CATS = (
    (5, (159,)),
    (7, (165, 145)),
    (11, (173, 148, 140)),
    (19, (176, 155, 140, 135)),
    (35, (180, 157, 141, 134, 130)),
    (67, (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)),
)

# 16x16 / chroma intra modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 sub-modes, numbered to match the kf_bmode probability table rows
# (libwebp enum order; the tree below yields these symbols)
B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU = range(10)

# key-frame mode trees (RFC 6386 section 11.2, 8.2 tree representation)
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)
BMODE_TREE = (-B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12,
              -B_HE, 10, -B_RD, -B_VR, -B_LD, 14, -B_VL, 16, -B_HD, -B_HU)

# mapping 16x16 mode -> implied 4x4 context mode for neighboring B_PRED MBs
_MODE_TO_BMODE = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}


# ---------------------------------------------------------------------------
# boolean coder (RFC 6386 section 7)
# ---------------------------------------------------------------------------

class BoolDecoder:
    __slots__ = ("buf", "pos", "rng", "value", "bit_count")

    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 2
        self.rng = 255
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.bit_count = 0

    def get_bit(self, prob: int) -> int:
        rng = self.rng
        split = 1 + (((rng - 1) * prob) >> 8)
        big = split << 8
        value = self.value
        if value >= big:
            ret = 1
            rng -= split
            value -= big
        else:
            ret = 0
            rng = split
        bit_count = self.bit_count
        while rng < 128:
            value <<= 1
            rng <<= 1
            bit_count += 1
            if bit_count == 8:
                bit_count = 0
                if self.pos < len(self.buf):
                    value |= self.buf[self.pos]
                    self.pos += 1
        self.rng = rng
        self.value = value
        self.bit_count = bit_count
        return ret

    def get_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get_bit(128)
        return v

    def get_signed(self, n: int) -> int:
        """Magnitude-then-sign literal used by header deltas."""
        v = self.get_literal(n)
        return -v if self.get_bit(128) else v

    def get_tree(self, tree, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.get_bit(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """Carry-propagating boolean encoder (RFC 6386 section 7.3)."""

    __slots__ = ("out", "rng", "bottom", "bit_count")

    def __init__(self):
        self.out = bytearray()
        self.rng = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def put_bit(self, prob: int, bit: int) -> None:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.rng -= split
        else:
            self.rng = split
        while self.rng < 128:
            self.rng <<= 1
            if self.bottom & (1 << 31):
                self._carry()
                self.bottom &= 0x7FFFFFFF
            self.bottom <<= 1
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def put_literal(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.put_bit(128, (value >> k) & 1)

    def put_signed(self, value: int, n: int) -> None:
        self.put_literal(abs(value), n)
        self.put_bit(128, 1 if value < 0 else 0)

    def put_tree(self, tree, probs, symbol: int) -> None:
        # walk the tree recording branch decisions to the target leaf
        path = []

        def walk(i):
            for b in (0, 1):
                t = tree[i + b]
                if t <= 0:
                    if -t == symbol:
                        path.append((i >> 1, b))
                        return True
                else:
                    if walk(t):
                        path.append((i >> 1, b))
                        return True
            return False

        walk(0)
        for pi, b in reversed(path):
            self.put_bit(probs[pi], b)

    def getvalue(self) -> bytes:
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
                self.bottom &= 0x7FFFFFFF
            self.bottom <<= 1
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8
        return bytes(self.out)


# ---------------------------------------------------------------------------
# inverse transforms (RFC 6386 section 14.3)
# ---------------------------------------------------------------------------

def idct4x4_batch(coeffs: np.ndarray) -> np.ndarray:
    """Batched exact VP8 inverse DCT: (n, 16) int -> (n, 4, 4) residual."""
    ip = coeffs.reshape(-1, 4, 4).astype(np.int64)
    # vertical pass (down each column)
    a1 = ip[:, 0, :] + ip[:, 2, :]
    b1 = ip[:, 0, :] - ip[:, 2, :]
    c1 = ((ip[:, 1, :] * 35468) >> 16) - \
        (ip[:, 3, :] + ((ip[:, 3, :] * 20091) >> 16))
    d1 = (ip[:, 1, :] + ((ip[:, 1, :] * 20091) >> 16)) + \
        ((ip[:, 3, :] * 35468) >> 16)
    tmp = np.stack([a1 + d1, b1 + c1, b1 - c1, a1 - d1], axis=1)
    # horizontal pass (across each row) with final rounding
    a1 = tmp[:, :, 0] + tmp[:, :, 2]
    b1 = tmp[:, :, 0] - tmp[:, :, 2]
    c1 = ((tmp[:, :, 1] * 35468) >> 16) - \
        (tmp[:, :, 3] + ((tmp[:, :, 3] * 20091) >> 16))
    d1 = (tmp[:, :, 1] + ((tmp[:, :, 1] * 20091) >> 16)) + \
        ((tmp[:, :, 3] * 35468) >> 16)
    out = np.stack([(a1 + d1 + 4) >> 3, (b1 + c1 + 4) >> 3,
                    (b1 - c1 + 4) >> 3, (a1 - d1 + 4) >> 3], axis=2)
    return out


def iwht4x4(coeffs: np.ndarray) -> np.ndarray:
    """Inverse Walsh-Hadamard for the Y2 block: (16,) -> (16,) DC values."""
    ip = coeffs.reshape(4, 4).astype(np.int64)
    a1 = ip[0, :] + ip[3, :]
    b1 = ip[1, :] + ip[2, :]
    c1 = ip[1, :] - ip[2, :]
    d1 = ip[0, :] - ip[3, :]
    tmp = np.stack([a1 + b1, c1 + d1, a1 - b1, d1 - c1], axis=0)
    a1 = tmp[:, 0] + tmp[:, 3]
    b1 = tmp[:, 1] + tmp[:, 2]
    c1 = tmp[:, 1] - tmp[:, 2]
    d1 = tmp[:, 0] - tmp[:, 3]
    out = np.stack([(a1 + b1 + 3) >> 3, (c1 + d1 + 3) >> 3,
                    (a1 - b1 + 3) >> 3, (d1 - c1 + 3) >> 3], axis=1)
    return out.reshape(16)


# ---------------------------------------------------------------------------
# header parsing (RFC 6386 sections 9-10)
# ---------------------------------------------------------------------------

def _clamp_q(q: int) -> int:
    return 0 if q < 0 else 127 if q > 127 else q


class FrameHeader:
    pass


def parse_frame_header(payload: bytes) -> FrameHeader:
    h = FrameHeader()
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    h.keyframe = not (tag & 1)
    h.version = (tag >> 1) & 7
    h.show_frame = (tag >> 4) & 1
    h.first_part_size = (tag >> 5) & 0x7FFFF
    if not h.keyframe:
        raise NotImplementedError("VP8 inter frames not supported "
                                  "(lossy WebP is always one key frame)")
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    (wraw,) = struct.unpack("<H", payload[6:8])
    (hraw,) = struct.unpack("<H", payload[8:10])
    h.width, h.xscale = wraw & 0x3FFF, wraw >> 14
    h.height, h.yscale = hraw & 0x3FFF, hraw >> 14
    h.mb_w = (h.width + 15) // 16
    h.mb_h = (h.height + 15) // 16

    bd = BoolDecoder(payload[10:10 + h.first_part_size])
    h.color_space = bd.get_bit(128)
    h.clamping_type = bd.get_bit(128)

    # segmentation (RFC 6386 section 9.3)
    h.segmentation = bd.get_bit(128)
    h.update_mb_seg_map = 0
    h.seg_abs = 0
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_tree_probs = [255, 255, 255]
    if h.segmentation:
        h.update_mb_seg_map = bd.get_bit(128)
        update_data = bd.get_bit(128)
        if update_data:
            h.seg_abs = bd.get_bit(128)
            for i in range(4):
                if bd.get_bit(128):
                    h.seg_quant[i] = bd.get_signed(7)
            for i in range(4):
                if bd.get_bit(128):
                    h.seg_lf[i] = bd.get_signed(6)
        if h.update_mb_seg_map:
            for i in range(3):
                if bd.get_bit(128):
                    h.seg_tree_probs[i] = bd.get_literal(8)

    # loop filter (RFC 6386 section 9.4)
    h.filter_type = bd.get_bit(128)  # 0 = normal, 1 = simple
    h.filter_level = bd.get_literal(6)
    h.sharpness = bd.get_literal(3)
    h.lf_delta_enabled = bd.get_bit(128)
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if bd.get_bit(128):  # update
            for i in range(4):
                if bd.get_bit(128):
                    h.ref_lf_deltas[i] = bd.get_signed(6)
            for i in range(4):
                if bd.get_bit(128):
                    h.mode_lf_deltas[i] = bd.get_signed(6)

    h.log2_partitions = bd.get_literal(2)

    # quantizer indices (RFC 6386 section 9.6)
    h.y_ac_qi = bd.get_literal(7)
    h.y_dc_delta = bd.get_signed(4) if bd.get_bit(128) else 0
    h.y2_dc_delta = bd.get_signed(4) if bd.get_bit(128) else 0
    h.y2_ac_delta = bd.get_signed(4) if bd.get_bit(128) else 0
    h.uv_dc_delta = bd.get_signed(4) if bd.get_bit(128) else 0
    h.uv_ac_delta = bd.get_signed(4) if bd.get_bit(128) else 0

    h.refresh_entropy = bd.get_bit(128)

    # coefficient probability updates (RFC 6386 section 13.4)
    probs = COEFF_PROBS.copy()
    upd = COEFF_UPDATE_PROBS
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    if bd.get_bit(int(upd[t, b, c, p])):
                        probs[t, b, c, p] = bd.get_literal(8)
    h.coeff_probs = probs

    h.mb_no_skip = bd.get_bit(128)
    h.prob_skip = bd.get_literal(8) if h.mb_no_skip else 0

    h.bd = bd  # continue with per-MB records
    return h


def _dequant_factors(h: FrameHeader):
    """Per-segment (y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac) (RFC 14.1)."""
    out = []
    for seg in range(4):
        if h.segmentation:
            q = h.seg_quant[seg] if h.seg_abs else h.y_ac_qi + h.seg_quant[seg]
        else:
            q = h.y_ac_qi
        q = _clamp_q(q)
        y_dc = int(DC_QLOOKUP[_clamp_q(q + h.y_dc_delta)])
        y_ac = int(AC_QLOOKUP[q])
        y2_dc = int(DC_QLOOKUP[_clamp_q(q + h.y2_dc_delta)]) * 2
        y2_ac = int(AC_QLOOKUP[_clamp_q(q + h.y2_ac_delta)]) * 155 // 100
        if y2_ac < 8:
            y2_ac = 8
        uv_dc = int(DC_QLOOKUP[_clamp_q(q + h.uv_dc_delta)])
        if uv_dc > 132:
            uv_dc = 132
        uv_ac = int(AC_QLOOKUP[_clamp_q(q + h.uv_ac_delta)])
        out.append((y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac))
    return out


# ---------------------------------------------------------------------------
# macroblock mode records (RFC 6386 sections 10-11, key frame layout)
# ---------------------------------------------------------------------------

def parse_mb_records(h: FrameHeader):
    bd = h.bd
    mb_w, mb_h = h.mb_w, h.mb_h
    records = []
    above_sub = np.full((mb_w, 4), B_DC, dtype=np.int32)
    for mby in range(mb_h):
        left_sub = np.full(4, B_DC, dtype=np.int32)
        for mbx in range(mb_w):
            seg = 0
            if h.segmentation and h.update_mb_seg_map:
                p = h.seg_tree_probs
                if bd.get_bit(p[0]):
                    seg = 2 + bd.get_bit(p[2])
                else:
                    seg = bd.get_bit(p[1])
            skip = bd.get_bit(h.prob_skip) if h.mb_no_skip else 0
            ymode = bd.get_tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            sub = None
            if ymode == B_PRED:
                sub = np.empty(16, dtype=np.int32)
                for i in range(16):
                    r, c = i >> 2, i & 3
                    a = above_sub[mbx, c] if r == 0 else sub[i - 4]
                    lft = left_sub[r] if c == 0 else sub[i - 1]
                    m = bd.get_tree(BMODE_TREE, KF_BMODE_PROBS[a][lft])
                    sub[i] = m
                above_sub[mbx] = sub[12:16]
                left_sub[:] = sub[3::4]
            else:
                bm = _MODE_TO_BMODE[ymode]
                above_sub[mbx] = bm
                left_sub[:] = bm
            uvmode = bd.get_tree(UV_MODE_TREE, KF_UV_MODE_PROBS)
            records.append((seg, skip, ymode, sub, uvmode))
    return records


# ---------------------------------------------------------------------------
# token (coefficient) decoding (RFC 6386 section 13)
# ---------------------------------------------------------------------------

def decode_coeffs(bd, probs_type, ctx, first, dq_dc, dq_ac, out):
    """Decode one 4x4 block's coefficients into out (len-16 int32 array,
    dequantized, in raster order). Returns the scan position after the last
    decoded coefficient (nonzero iff > first)."""
    p = probs_type[KBANDS[first]][ctx]
    n = first
    get_bit = bd.get_bit
    while n < 16:
        if not get_bit(p[0]):
            break
        while not get_bit(p[1]):
            n += 1
            if n == 16:
                return 16
            p = probs_type[KBANDS[n]][0]
        if not get_bit(p[2]):
            v = 1
            next_ctx = 1
        else:
            next_ctx = 2
            if not get_bit(p[3]):
                if not get_bit(p[4]):
                    v = 2
                else:
                    v = 3 + get_bit(p[5])
            elif not get_bit(p[6]):
                if not get_bit(p[7]):
                    v = 5 + get_bit(159)
                else:
                    v = 7 + 2 * get_bit(165) + get_bit(145)
            else:
                if not get_bit(p[8]):
                    if not get_bit(p[9]):
                        base, tab = _CATS[2]
                    else:
                        base, tab = _CATS[3]
                else:
                    if not get_bit(p[10]):
                        base, tab = _CATS[4]
                    else:
                        base, tab = _CATS[5]
                v = 0
                for prob in tab:
                    v = (v << 1) | get_bit(prob)
                v += base
        if get_bit(128):
            v = -v
        out[ZIGZAG[n]] = v * (dq_dc if n == 0 else dq_ac)
        n += 1
        if n == 16:
            return 16
        p = probs_type[KBANDS[n]][next_ctx]
    return n


# ---------------------------------------------------------------------------
# intra prediction (RFC 6386 section 12; AVG2/AVG3 helpers)
# ---------------------------------------------------------------------------

def _avg2(a, b):
    return (int(a) + int(b) + 1) >> 1


def _avg3(a, b, c):
    return (int(a) + 2 * int(b) + int(c) + 2) >> 2


def _pred_block(plane, y0, x0, size, mode, have_above, have_left):
    """16x16 / 8x8 whole-block intra prediction (DC/V/H/TM)."""
    above = plane[y0 - 1, x0:x0 + size].astype(np.int32)
    left = plane[y0:y0 + size, x0 - 1].astype(np.int32)
    tl = int(plane[y0 - 1, x0 - 1])
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + size) >> \
                (5 if size == 16 else 4)
        elif have_above:
            dc = (int(above.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        elif have_left:
            dc = (int(left.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int32)
    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size))
    # TM_PRED
    return np.clip(left[:, None] + above[None, :] - tl, 0, 255)


def _pred_sub(plane, sy, sx, mode, ar):
    """4x4 sub-block prediction. ar = the 4 above-right pixels."""
    A = plane[sy - 1, sx:sx + 4].astype(np.int32)
    L = plane[sy:sy + 4, sx - 1].astype(np.int32)
    X = int(plane[sy - 1, sx - 1])
    E = np.concatenate([A, ar.astype(np.int32)])  # 8 above pixels
    out = np.empty((4, 4), dtype=np.int32)
    if mode == B_DC:
        out[:] = (int(A.sum()) + int(L.sum()) + 4) >> 3
    elif mode == B_TM:
        out[:] = np.clip(L[:, None] + A[None, :] - X, 0, 255)
    elif mode == B_VE:
        row = [_avg3(X, E[0], E[1]), _avg3(E[0], E[1], E[2]),
               _avg3(E[1], E[2], E[3]), _avg3(E[2], E[3], E[4])]
        out[:] = np.array(row, dtype=np.int32)[None, :]
    elif mode == B_HE:
        col = [_avg3(X, L[0], L[1]), _avg3(L[0], L[1], L[2]),
               _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3])]
        out[:] = np.array(col, dtype=np.int32)[:, None]
    elif mode == B_LD:
        d = [_avg3(E[i], E[i + 1], E[i + 2]) for i in range(6)]
        d.append(_avg3(E[6], E[7], E[7]))
        for r in range(4):
            for c in range(4):
                out[r, c] = d[r + c]
    elif mode == B_RD:
        I, J, K, Lv = int(L[0]), int(L[1]), int(L[2]), int(L[3])
        A0, B0, C0, D0 = int(A[0]), int(A[1]), int(A[2]), int(A[3])
        d = [_avg3(J, K, Lv), _avg3(I, J, K), _avg3(X, I, J),
             _avg3(A0, X, I), _avg3(B0, A0, X), _avg3(C0, B0, A0),
             _avg3(D0, C0, B0)]
        for r in range(4):
            for c in range(4):
                out[r, c] = d[3 + c - r]
    elif mode == B_VR:
        I, J, K = int(L[0]), int(L[1]), int(L[2])
        A0, B0, C0, D0 = int(A[0]), int(A[1]), int(A[2]), int(A[3])
        out[0, 0] = out[2, 1] = _avg2(X, A0)
        out[0, 1] = out[2, 2] = _avg2(A0, B0)
        out[0, 2] = out[2, 3] = _avg2(B0, C0)
        out[0, 3] = _avg2(C0, D0)
        out[3, 0] = _avg3(K, J, I)
        out[2, 0] = _avg3(J, I, X)
        out[1, 0] = out[3, 1] = _avg3(I, X, A0)
        out[1, 1] = out[3, 2] = _avg3(X, A0, B0)
        out[1, 2] = out[3, 3] = _avg3(A0, B0, C0)
        out[1, 3] = _avg3(B0, C0, D0)
    elif mode == B_VL:
        out[0, 0] = _avg2(E[0], E[1])
        out[0, 1] = out[2, 0] = _avg2(E[1], E[2])
        out[0, 2] = out[2, 1] = _avg2(E[2], E[3])
        out[0, 3] = out[2, 2] = _avg2(E[3], E[4])
        out[1, 0] = _avg3(E[0], E[1], E[2])
        out[1, 1] = out[3, 0] = _avg3(E[1], E[2], E[3])
        out[1, 2] = out[3, 1] = _avg3(E[2], E[3], E[4])
        out[1, 3] = out[3, 2] = _avg3(E[3], E[4], E[5])
        out[2, 3] = _avg3(E[4], E[5], E[6])
        out[3, 3] = _avg3(E[5], E[6], E[7])
    elif mode == B_HD:
        I, J, K, Lv = int(L[0]), int(L[1]), int(L[2]), int(L[3])
        A0, B0, C0 = int(A[0]), int(A[1]), int(A[2])
        out[0, 0] = out[1, 2] = _avg2(I, X)
        out[1, 0] = out[2, 2] = _avg2(J, I)
        out[2, 0] = out[3, 2] = _avg2(K, J)
        out[3, 0] = _avg2(Lv, K)
        out[0, 3] = _avg3(A0, B0, C0)
        out[0, 2] = _avg3(X, A0, B0)
        out[0, 1] = out[1, 3] = _avg3(I, X, A0)
        out[1, 1] = out[2, 3] = _avg3(X, I, J)
        out[2, 1] = out[3, 3] = _avg3(I, J, K)
        out[3, 1] = _avg3(J, K, Lv)
    else:  # B_HU
        I, J, K, Lv = int(L[0]), int(L[1]), int(L[2]), int(L[3])
        out[0, 0] = _avg2(I, J)
        out[0, 2] = out[1, 0] = _avg2(J, K)
        out[1, 2] = out[2, 0] = _avg2(K, Lv)
        out[0, 1] = _avg3(I, J, K)
        out[0, 3] = out[1, 1] = _avg3(J, K, Lv)
        out[1, 3] = out[2, 1] = _avg3(K, Lv, Lv)
        out[2, 2] = out[2, 3] = Lv
        out[3, 0] = out[3, 1] = out[3, 2] = out[3, 3] = Lv
    return out


# ---------------------------------------------------------------------------
# frame decode (reconstruction pass, then loop filter pass)
# ---------------------------------------------------------------------------

def decode_vp8_frame(payload: bytes, apply_filter: bool = True):
    """Decode a VP8 key frame -> (Y, U, V) uint8 planes cropped to the frame
    size (Y: h x w; U/V: ceil(h/2) x ceil(w/2))."""
    h = parse_frame_header(payload)
    records = parse_mb_records(h)
    mb_w, mb_h = h.mb_w, h.mb_h

    # token partitions
    n_parts = 1 << h.log2_partitions
    base = 10 + h.first_part_size
    sizes = []
    for i in range(n_parts - 1):
        sizes.append(payload[base + 3 * i] | (payload[base + 3 * i + 1] << 8)
                     | (payload[base + 3 * i + 2] << 16))
    off = base + 3 * (n_parts - 1)
    parts = []
    for i in range(n_parts):
        ln = sizes[i] if i < n_parts - 1 else len(payload) - off
        parts.append(BoolDecoder(payload[off:off + ln]))
        off += ln

    dq = _dequant_factors(h)
    probs = h.coeff_probs

    W, H = mb_w * 16, mb_h * 16
    Y = np.empty((H + 1, W + 5), dtype=np.uint8)
    U = np.empty((H // 2 + 1, W // 2 + 1), dtype=np.uint8)
    V = np.empty((H // 2 + 1, W // 2 + 1), dtype=np.uint8)
    for P in (Y, U, V):
        P[0, :] = 127
        P[:, 0] = 129
        P[0, 0] = 127

    # nonzero-coefficient contexts
    a_y = np.zeros(mb_w * 4, dtype=np.int32)
    a_u = np.zeros(mb_w * 2, dtype=np.int32)
    a_v = np.zeros(mb_w * 2, dtype=np.int32)
    a_y2 = np.zeros(mb_w, dtype=np.int32)

    # per-MB loop-filter info: (level, inner)
    lf_info = []

    for mby in range(mb_h):
        bd = parts[mby % n_parts]
        l_y = np.zeros(4, dtype=np.int32)
        l_u = np.zeros(2, dtype=np.int32)
        l_v = np.zeros(2, dtype=np.int32)
        l_y2 = 0
        for mbx in range(mb_w):
            seg, skip, ymode, sub, uvmode = records[mby * mb_w + mbx]
            y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac = dq[seg]
            has_y2 = ymode != B_PRED
            ycoef = np.zeros((16, 16), dtype=np.int32)
            ucoef = np.zeros((4, 16), dtype=np.int32)
            vcoef = np.zeros((4, 16), dtype=np.int32)
            any_nz = False
            if skip:
                l_y[:] = 0
                a_y[mbx * 4:mbx * 4 + 4] = 0
                l_u[:] = 0
                a_u[mbx * 2:mbx * 2 + 2] = 0
                l_v[:] = 0
                a_v[mbx * 2:mbx * 2 + 2] = 0
                if has_y2:
                    l_y2 = 0
                    a_y2[mbx] = 0
            else:
                first = 0
                if has_y2:
                    ctx = l_y2 + a_y2[mbx]
                    y2raw = np.zeros(16, dtype=np.int32)
                    n = decode_coeffs(bd, probs[1], ctx, 0, y2_dc, y2_ac,
                                      y2raw)
                    nz = 1 if n > 0 else 0
                    l_y2 = nz
                    a_y2[mbx] = nz
                    if nz:
                        any_nz = True
                    dcs = iwht4x4(y2raw)
                    ycoef[:, 0] = dcs
                    first = 1
                    ytype = 0
                else:
                    ytype = 3
                for b in range(16):
                    r, c = b >> 2, b & 3
                    ctx = l_y[r] + a_y[mbx * 4 + c]
                    n = decode_coeffs(bd, probs[ytype], ctx, first,
                                      y_dc, y_ac, ycoef[b])
                    nz = 1 if n > first else 0
                    l_y[r] = nz
                    a_y[mbx * 4 + c] = nz
                    if nz:
                        any_nz = True
                for coef, l_c, a_c in ((ucoef, l_u, a_u), (vcoef, l_v, a_v)):
                    for b in range(4):
                        r, c = b >> 1, b & 1
                        ctx = l_c[r] + a_c[mbx * 2 + c]
                        n = decode_coeffs(bd, probs[2], ctx, 0,
                                          uv_dc, uv_ac, coef[b])
                        nz = 1 if n > 0 else 0
                        l_c[r] = nz
                        a_c[mbx * 2 + c] = nz
                        if nz:
                            any_nz = True

            # ---- reconstruction ----
            y0, x0 = 1 + mby * 16, 1 + mbx * 16
            have_above = mby > 0
            have_left = mbx > 0
            if ymode != B_PRED:
                pred = _pred_block(Y, y0, x0, 16, ymode, have_above,
                                   have_left)
                res = idct4x4_batch(ycoef)
                blk = pred.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3) \
                    .reshape(16, 4, 4) + res
                Y[y0:y0 + 16, x0:x0 + 16] = np.clip(
                    blk.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3)
                    .reshape(16, 16), 0, 255).astype(np.uint8)
            else:
                res = idct4x4_batch(ycoef)
                for b in range(16):
                    r, c = b >> 2, b & 3
                    sy, sx = y0 + r * 4, x0 + c * 4
                    if c == 3:
                        ar = Y[y0 - 1, x0 + 16:x0 + 20]
                    else:
                        ar = Y[sy - 1, sx + 4:sx + 8]
                    pred = _pred_sub(Y, sy, sx, int(sub[b]), ar)
                    Y[sy:sy + 4, sx:sx + 4] = np.clip(
                        pred + res[b], 0, 255).astype(np.uint8)
            c0, cx0 = 1 + mby * 8, 1 + mbx * 8
            for P, coef in ((U, ucoef), (V, vcoef)):
                pred = _pred_block(P, c0, cx0, 8, uvmode, have_above,
                                   have_left)
                res = idct4x4_batch(coef)
                blk = pred.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3) \
                    .reshape(4, 4, 4) + res
                P[c0:c0 + 8, cx0:cx0 + 8] = np.clip(
                    blk.reshape(2, 2, 4, 4).transpose(0, 2, 1, 3)
                    .reshape(8, 8), 0, 255).astype(np.uint8)

            # loop-filter level for this MB (RFC 6386 section 15.1)
            if h.segmentation:
                lvl = h.seg_lf[seg] if h.seg_abs \
                    else h.filter_level + h.seg_lf[seg]
            else:
                lvl = h.filter_level
            if h.lf_delta_enabled:
                lvl += h.ref_lf_deltas[0]  # keyframe: intra
                if ymode == B_PRED:
                    lvl += h.mode_lf_deltas[0]
            lvl = 0 if lvl < 0 else 63 if lvl > 63 else lvl
            inner = (ymode == B_PRED) or any_nz
            lf_info.append((lvl, inner))

        # extend the above-right border for the next MB row: replicate the
        # last reconstructed column (libvpx extends the recon border by
        # replication; row 0 uses the 127 init)
        Y[y0:y0 + 16, W + 1:W + 5] = Y[y0:y0 + 16, W:W + 1]

    if apply_filter and h.filter_level > 0:
        _loop_filter(h, lf_info, Y, U, V)

    cw, ch = (h.width + 1) // 2, (h.height + 1) // 2
    return (Y[1:1 + h.height, 1:1 + h.width].copy(),
            U[1:1 + ch, 1:1 + cw].copy(),
            V[1:1 + ch, 1:1 + cw].copy())


# ---------------------------------------------------------------------------
# loop filter (RFC 6386 section 15)
# ---------------------------------------------------------------------------

def _c8(x):
    return np.clip(x, -128, 127)


def _common_adjust(use_outer, p1, p0, q0, q1):
    """RFC 6386 15.1 common_adjust on signed int32 arrays (value-128).
    Mutates p0/q0 in place; returns the +4 filter value F."""
    a = _c8((_c8(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f1 = _c8(a + 4) >> 3
    f2 = _c8(a + 3) >> 3
    q0 -= f1
    p0 += f2
    np.clip(q0, -128, 127, out=q0)
    np.clip(p0, -128, 127, out=p0)
    return f1


def _filter_mask(p3, p2, p1, p0, q0, q1, q2, q3, E, I):
    return ((np.abs(p3 - p2) <= I) & (np.abs(p2 - p1) <= I) &
            (np.abs(p1 - p0) <= I) & (np.abs(q1 - q0) <= I) &
            (np.abs(q2 - q1) <= I) & (np.abs(q3 - q2) <= I) &
            (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= E))


def _hev_mask(p1, p0, q0, q1, t):
    return (np.abs(p1 - p0) > t) | (np.abs(q1 - q0) > t)


def _apply_normal(seg, E, I, T, mb_edge):
    """seg: int32 array (8, n) of pixel values across the edge (p3..q3).
    Filters in place per RFC subblock_filter / mbfilter."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (seg[i] for i in range(8))
    mask = _filter_mask(p3, p2, p1, p0, q0, q1, q2, q3, E, I)
    if not mask.any():
        return
    hev = _hev_mask(p1, p0, q0, q1, T)
    sp2, sp1, sp0 = p2 - 128, p1 - 128, p0 - 128
    sq0, sq1, sq2 = q0 - 128, q1 - 128, q2 - 128
    if mb_edge:
        # hev branch: common adjust with outer taps
        hp1, hp0, hq0, hq1 = sp1.copy(), sp0.copy(), sq0.copy(), sq1.copy()
        _common_adjust(True, hp1, hp0, hq0, hq1)
        # non-hev branch: 27/18/9 wide filter
        w = _c8(_c8(sp1 - sq1) + 3 * (sq0 - sp0))
        a = _c8((27 * w + 63) >> 7)
        np0, nq0 = _c8(sp0 + a), _c8(sq0 - a)
        a = _c8((18 * w + 63) >> 7)
        np1, nq1 = _c8(sp1 + a), _c8(sq1 - a)
        a = _c8((9 * w + 63) >> 7)
        np2, nq2 = _c8(sp2 + a), _c8(sq2 - a)
        fh = mask & hev
        fn = mask & ~hev
        seg[2] = np.where(fn, np1 + 128, p1)
        seg[3] = np.where(fh, hp0 + 128, np.where(fn, np0 + 128, p0))
        seg[4] = np.where(fh, hq0 + 128, np.where(fn, nq0 + 128, q0))
        seg[5] = np.where(fn, nq1 + 128, q1)
        seg[1] = np.where(fn, np2 + 128, p2)
        seg[6] = np.where(fn, nq2 + 128, q2)
    else:
        # subblock filter: common adjust (outer taps iff hev), then
        # half-step on p1/q1 where !hev
        a = _c8(np.where(hev, _c8(sp1 - sq1), 0) + 3 * (sq0 - sp0))
        f1 = _c8(a + 4) >> 3
        f2 = _c8(a + 3) >> 3
        nq0 = _c8(sq0 - f1)
        np0 = _c8(sp0 + f2)
        u = (f1 + 1) >> 1
        nq1 = _c8(sq1 - u)
        np1 = _c8(sp1 + u)
        seg[3] = np.where(mask, np0 + 128, p0)
        seg[4] = np.where(mask, nq0 + 128, q0)
        fn = mask & ~hev
        seg[2] = np.where(fn, np1 + 128, p1)
        seg[5] = np.where(fn, nq1 + 128, q1)


def _apply_simple(seg, E):
    """Simple filter on (4, n) [p1 p0 q0 q1]."""
    p1, p0, q0, q1 = (seg[i] for i in range(4))
    mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= E
    if not mask.any():
        return
    sp1, sp0, sq0, sq1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    a = _c8(_c8(sp1 - sq1) + 3 * (sq0 - sp0))
    f1 = _c8(a + 4) >> 3
    f2 = _c8(a + 3) >> 3
    np0 = _c8(sp0 + f2)
    nq0 = _c8(sq0 - f1)
    seg[1] = np.where(mask, np0 + 128, p0)
    seg[2] = np.where(mask, nq0 + 128, q0)


def _edge_cols(P, y0, x, h, n):
    """(2n, h) int32 view of columns [x-n, x+n) at rows y0..y0+h."""
    return P[y0:y0 + h, x - n:x + n].astype(np.int32).T.copy()


def _edge_rows(P, y, x0, w, n):
    return P[y - n:y + n, x0:x0 + w].astype(np.int32).copy()


def _store_cols(P, y0, x, h, n, seg):
    P[y0:y0 + h, x - n:x + n] = seg.T.astype(np.uint8)


def _store_rows(P, y, x0, w, n, seg):
    P[y - n:y + n, x0:x0 + w] = seg.astype(np.uint8)


def _loop_filter(h: FrameHeader, lf_info, Y, U, V):
    sharp = h.sharpness
    simple = h.filter_type == 1
    mb_w, mb_h = h.mb_w, h.mb_h
    for mby in range(mb_h):
        for mbx in range(mb_w):
            lvl, inner = lf_info[mby * mb_w + mbx]
            if lvl == 0:
                continue
            interior = lvl
            if sharp > 0:
                interior >>= 2 if sharp > 4 else 1
                if interior > 9 - sharp:
                    interior = 9 - sharp
            if interior < 1:
                interior = 1
            mb_e = (lvl + 2) * 2 + interior
            sub_e = lvl * 2 + interior
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            y0, x0 = 1 + mby * 16, 1 + mbx * 16
            c0, cx0 = 1 + mby * 8, 1 + mbx * 8
            if simple:
                if mbx > 0:
                    seg = _edge_cols(Y, y0, x0, 16, 2)
                    _apply_simple(seg, mb_e)
                    _store_cols(Y, y0, x0, 16, 2, seg)
                if inner:
                    for dx in (4, 8, 12):
                        seg = _edge_cols(Y, y0, x0 + dx, 16, 2)
                        _apply_simple(seg, sub_e)
                        _store_cols(Y, y0, x0 + dx, 16, 2, seg)
                if mby > 0:
                    seg = _edge_rows(Y, y0, x0, 16, 2)
                    _apply_simple(seg, mb_e)
                    _store_rows(Y, y0, x0, 16, 2, seg)
                if inner:
                    for dy in (4, 8, 12):
                        seg = _edge_rows(Y, y0 + dy, x0, 16, 2)
                        _apply_simple(seg, sub_e)
                        _store_rows(Y, y0 + dy, x0, 16, 2, seg)
                continue
            # normal filter
            if mbx > 0:
                seg = _edge_cols(Y, y0, x0, 16, 4)
                _apply_normal(seg, mb_e, interior, hev_t, True)
                _store_cols(Y, y0, x0, 16, 4, seg)
                for P in (U, V):
                    seg = _edge_cols(P, c0, cx0, 8, 4)
                    _apply_normal(seg, mb_e, interior, hev_t, True)
                    _store_cols(P, c0, cx0, 8, 4, seg)
            if inner:
                for dx in (4, 8, 12):
                    seg = _edge_cols(Y, y0, x0 + dx, 16, 4)
                    _apply_normal(seg, sub_e, interior, hev_t, False)
                    _store_cols(Y, y0, x0 + dx, 16, 4, seg)
                for P in (U, V):
                    seg = _edge_cols(P, c0, cx0 + 4, 8, 4)
                    _apply_normal(seg, sub_e, interior, hev_t, False)
                    _store_cols(P, c0, cx0 + 4, 8, 4, seg)
            if mby > 0:
                seg = _edge_rows(Y, y0, x0, 16, 4)
                _apply_normal(seg, mb_e, interior, hev_t, True)
                _store_rows(Y, y0, x0, 16, 4, seg)
                for P in (U, V):
                    seg = _edge_rows(P, c0, cx0, 8, 4)
                    _apply_normal(seg, mb_e, interior, hev_t, True)
                    _store_rows(P, c0, cx0, 8, 4, seg)
            if inner:
                for dy in (4, 8, 12):
                    seg = _edge_rows(Y, y0 + dy, x0, 16, 4)
                    _apply_normal(seg, sub_e, interior, hev_t, False)
                    _store_rows(Y, y0 + dy, x0, 16, 4, seg)
                for P in (U, V):
                    seg = _edge_rows(P, c0 + 4, cx0, 8, 4)
                    _apply_normal(seg, sub_e, interior, hev_t, False)
                    _store_rows(P, c0 + 4, cx0, 8, 4, seg)


# ---------------------------------------------------------------------------
# YUV <-> RGB (BT.601 studio range).  The upsampler is libwebp's "fancy"
# 9-3-3-1 bilinear stencil (dsp/upsampling.c) and the conversion uses the
# same fixed-point coefficients as dsp/yuv.h, so RGB output matches
# libwebp's WebPDecodeRGB for the shared YUV signal.
# ---------------------------------------------------------------------------

def _fancy_upsample(c: np.ndarray, h: int, w: int) -> np.ndarray:
    """4:2:0 chroma plane -> full-res int32 plane via the 9-3-3-1 kernel.

    For the square of chroma samples [a b; c d] the four interleaved output
    pixels are (9a+3b+3c+d+8)>>4 and rotations; borders replicate.
    """
    p = np.pad(c.astype(np.int32), 1, mode="edge")
    ch, cw = c.shape
    C = p[1:1 + ch, 1:1 + cw]
    L = p[1:1 + ch, 0:cw]
    R = p[1:1 + ch, 2:2 + cw]
    T = p[0:ch, 1:1 + cw]
    B = p[2:2 + ch, 1:1 + cw]
    TL = p[0:ch, 0:cw]
    TR = p[0:ch, 2:2 + cw]
    BL = p[2:2 + ch, 0:cw]
    BR = p[2:2 + ch, 2:2 + cw]
    out = np.empty((2 * ch, 2 * cw), dtype=np.int32)
    out[0::2, 0::2] = (9 * C + 3 * (L + T) + TL + 8) >> 4
    out[0::2, 1::2] = (9 * C + 3 * (R + T) + TR + 8) >> 4
    out[1::2, 0::2] = (9 * C + 3 * (L + B) + BL + 8) >> 4
    out[1::2, 1::2] = (9 * C + 3 * (R + B) + BR + 8) >> 4
    return out[:h, :w]


def _mult_hi(v, coeff):  # (v * coeff) >> 8 with v promoted
    return (v * coeff) >> 8


def yuv420_to_rgb(y, u, v):
    h, w = y.shape
    uu = _fancy_upsample(u, h, w)
    vv = _fancy_upsample(v, h, w)
    yy = _mult_hi(y.astype(np.int64), 19077)
    r = yy + _mult_hi(vv, 26149) - 14234
    g = yy - _mult_hi(uu, 6419) - _mult_hi(vv, 13320) + 8708
    b = yy + _mult_hi(uu, 33050) - 17685
    rgb = np.stack([r, g, b], axis=2) >> 6
    return np.clip(rgb, 0, 255).astype(np.uint8)


def rgb_to_yuv420(rgb):
    r = rgb[:, :, 0].astype(np.int32)
    g = rgb[:, :, 1].astype(np.int32)
    b = rgb[:, :, 2].astype(np.int32)
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    u = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
    v = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
    h, w = y.shape
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    up = np.empty((ph, pw), dtype=np.int32)
    vp = np.empty((ph, pw), dtype=np.int32)
    up[:h, :w], vp[:h, :w] = u, v
    if w < pw:
        up[:h, w:] = u[:, -1:]
        vp[:h, w:] = v[:, -1:]
    if h < ph:
        up[h:, :] = up[h - 1:h, :]
        vp[h:, :] = vp[h - 1:h, :]
    u2 = (up[0::2, 0::2] + up[0::2, 1::2] + up[1::2, 0::2]
          + up[1::2, 1::2] + 2) >> 2
    v2 = (vp[0::2, 0::2] + vp[0::2, 1::2] + vp[1::2, 0::2]
          + vp[1::2, 1::2] + 2) >> 2
    return (np.clip(y, 0, 255).astype(np.uint8),
            np.clip(u2, 0, 255).astype(np.uint8),
            np.clip(v2, 0, 255).astype(np.uint8))


def decode_vp8_rgb(payload: bytes) -> np.ndarray:
    """VP8 chunk payload -> RGB8 (h, w, 3)."""
    y, u, v = decode_vp8_frame(payload)
    return yuv420_to_rgb(y, u, v)


# ---------------------------------------------------------------------------
# encoder (intra key frame).  The forward transforms are the libvpx pair of
# the exact inverse transforms above (vp8_short_fdct4x4 / vp8_short_walsh4x4,
# public libvpx encoder/dct.c); everything else is RFC 6386 written in the
# encode direction.  Validity does not depend on the forward transform (any
# conforming decoder reconstructs exactly what the in-loop reconstruction
# below computed); the libvpx pair just maximizes quality for the idct.
# ---------------------------------------------------------------------------

def fdct4x4_batch(blocks: np.ndarray) -> np.ndarray:
    """(n, 4, 4) int residuals -> (n, 16) raster-order DCT coefficients."""
    ip = blocks.astype(np.int64)
    # horizontal pass (within each row)
    a1 = (ip[:, :, 0] + ip[:, :, 3]) * 8
    b1 = (ip[:, :, 1] + ip[:, :, 2]) * 8
    c1 = (ip[:, :, 1] - ip[:, :, 2]) * 8
    d1 = (ip[:, :, 0] - ip[:, :, 3]) * 8
    tmp = np.stack([a1 + b1,
                    (c1 * 2217 + d1 * 5352 + 14500) >> 12,
                    a1 - b1,
                    (d1 * 2217 - c1 * 5352 + 7500) >> 12], axis=2)
    # vertical pass (down each column)
    a1 = tmp[:, 0, :] + tmp[:, 3, :]
    b1 = tmp[:, 1, :] + tmp[:, 2, :]
    c1 = tmp[:, 1, :] - tmp[:, 2, :]
    d1 = tmp[:, 0, :] - tmp[:, 3, :]
    out = np.stack([(a1 + b1 + 7) >> 4,
                    ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (d1 != 0),
                    (a1 - b1 + 7) >> 4,
                    (d1 * 2217 - c1 * 5352 + 51000) >> 16], axis=1)
    return out.reshape(-1, 16)


#: Hadamard basis of the RFC 6386 inverse WHT (iwht4x4 computes
#: X = (M F M + rounding) / 8 with this symmetric M, M @ M == 4I).
_WHT_M = np.array([[1, 1, 1, 1],
                   [1, 1, -1, -1],
                   [1, -1, -1, 1],
                   [1, -1, 1, -1]], dtype=np.int64)


def fwht4x4(dcs: np.ndarray) -> np.ndarray:
    """Forward Walsh-Hadamard for the Y2 block: 16 block DCs -> 16 coeffs.

    Exact algebraic pair of iwht4x4: from X = M F M / 8 and M**2 = 4I,
    F = M X M / 2 (halves rounded to nearest; the quantizer absorbs the
    sub-unit error)."""
    x = dcs.reshape(4, 4).astype(np.int64)
    w = _WHT_M @ x @ _WHT_M
    out = np.where(w >= 0, (w + 1) >> 1, -((1 - w) >> 1))  # round half away
    return out.reshape(16)


def _quantize_scan(coeffs16: np.ndarray, dq_dc: int, dq_ac: int,
                   first: int) -> np.ndarray:
    """Raster coefficients -> len-16 quantized token values in SCAN order
    (tokens[n] pairs with decode_coeffs' out[ZIGZAG[n]]).  Positions < first
    are zeroed (the caller carries DC through the Y2 block)."""
    t = np.zeros(16, dtype=np.int64)
    for n in range(first, 16):
        c = int(coeffs16[ZIGZAG[n]])
        dq = dq_dc if n == 0 else dq_ac
        q = (abs(c) + (dq >> 1)) // dq
        if q > 2047:          # category-6 extra bits hold 11 bits
            q = 2047
        t[n] = -q if c < 0 else q
    return t


def _encode_coeffs(be: BoolEncoder, probs_type, ctx: int, first: int,
                   tokens: np.ndarray) -> int:
    """Exact mirror of decode_coeffs: emit one block's token stream.
    Returns the scan position after the last coefficient (nonzero iff
    > first), for the same above/left nz-context bookkeeping."""
    last = -1
    for n in range(first, 16):
        if tokens[n]:
            last = n
    p = probs_type[KBANDS[first]][ctx]
    n = first
    while n < 16:
        if n > last:
            be.put_bit(int(p[0]), 0)
            return n
        be.put_bit(int(p[0]), 1)
        while tokens[n] == 0:
            be.put_bit(int(p[1]), 0)
            n += 1
            p = probs_type[KBANDS[n]][0]
        be.put_bit(int(p[1]), 1)
        v = abs(int(tokens[n]))
        if v == 1:
            be.put_bit(int(p[2]), 0)
            next_ctx = 1
        else:
            be.put_bit(int(p[2]), 1)
            next_ctx = 2
            if v <= 4:
                be.put_bit(int(p[3]), 0)
                if v == 2:
                    be.put_bit(int(p[4]), 0)
                else:
                    be.put_bit(int(p[4]), 1)
                    be.put_bit(int(p[5]), v - 3)
            elif v <= 10:
                be.put_bit(int(p[3]), 1)
                be.put_bit(int(p[6]), 0)
                if v <= 6:
                    be.put_bit(int(p[7]), 0)
                    be.put_bit(159, v - 5)
                else:
                    be.put_bit(int(p[7]), 1)
                    be.put_bit(165, (v - 7) >> 1)
                    be.put_bit(145, (v - 7) & 1)
            else:
                be.put_bit(int(p[3]), 1)
                be.put_bit(int(p[6]), 1)
                if v < 19:
                    be.put_bit(int(p[8]), 0)
                    be.put_bit(int(p[9]), 0)
                    cat = 2
                elif v < 35:
                    be.put_bit(int(p[8]), 0)
                    be.put_bit(int(p[9]), 1)
                    cat = 3
                elif v < 67:
                    be.put_bit(int(p[8]), 1)
                    be.put_bit(int(p[10]), 0)
                    cat = 4
                else:
                    be.put_bit(int(p[8]), 1)
                    be.put_bit(int(p[10]), 1)
                    cat = 5
                base, tab = _CATS[cat]
                extra = v - base
                for k, prob in enumerate(tab):
                    be.put_bit(prob, (extra >> (len(tab) - 1 - k)) & 1)
        be.put_bit(128, 1 if tokens[n] < 0 else 0)
        n += 1
        if n == 16:
            return 16
        p = probs_type[KBANDS[n]][next_ctx]
    return n


_BLK = np.arange(16)  # block raster helpers


def _split16(plane16: np.ndarray) -> np.ndarray:
    """(16, 16) -> (16, 4, 4) raster-ordered 4x4 blocks (decoder layout)."""
    return plane16.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 4, 4)


def _join16(blocks: np.ndarray) -> np.ndarray:
    """(16, 4, 4) -> (16, 16), inverse of _split16."""
    return blocks.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)


def _split8(plane8: np.ndarray) -> np.ndarray:
    return plane8.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3).reshape(4, 4, 4)


def _join8(blocks: np.ndarray) -> np.ndarray:
    return blocks.reshape(2, 2, 4, 4).transpose(0, 2, 1, 3).reshape(8, 8)


def encode_vp8_frame(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                     qindex: int = 32) -> bytes:
    """(Y, U, V) uint8 planes (4:2:0) -> VP8 key-frame payload.

    Intra-only, 16x16/chroma DC/V/H/TM modes chosen per macroblock by SSE
    against the in-loop reconstruction, one token partition, loop filter
    level 0 (the reconstruction IS the decoded output), default coefficient
    probabilities.  Decodes in any conforming VP8 decoder (libwebp interop
    is tested in tests/test_vp8.py)."""
    hgt, wid = y.shape
    mb_w, mb_h = (wid + 15) // 16, (hgt + 15) // 16
    W, H = mb_w * 16, mb_h * 16

    # pad sources to whole macroblocks by edge replication
    ys = np.pad(y, ((0, H - hgt), (0, W - wid)), mode="edge").astype(np.int32)
    ch, cw = u.shape
    us = np.pad(u, ((0, H // 2 - ch), (0, W // 2 - cw)), mode="edge") \
        .astype(np.int32)
    vs = np.pad(v, ((0, H // 2 - ch), (0, W // 2 - cw)), mode="edge") \
        .astype(np.int32)

    q = _clamp_q(qindex)
    y_dc, y_ac = int(DC_QLOOKUP[q]), int(AC_QLOOKUP[q])
    y2_dc, y2_ac = y_dc * 2, max(8, y_ac * 155 // 100)
    uv_dc, uv_ac = min(132, y_dc), y_ac

    # reconstruction planes, decoder border layout
    Y = np.empty((H + 1, W + 5), dtype=np.uint8)
    U = np.empty((H // 2 + 1, W // 2 + 1), dtype=np.uint8)
    V = np.empty((H // 2 + 1, W // 2 + 1), dtype=np.uint8)
    for P in (Y, U, V):
        P[0, :] = 127
        P[:, 0] = 129
        P[0, 0] = 127

    A = BoolEncoder()   # first partition: header + per-MB modes
    B = BoolEncoder()   # token partition

    # frame header (RFC 6386 section 9), mirroring parse_frame_header
    A.put_bit(128, 0)          # color space
    A.put_bit(128, 0)          # clamping type
    A.put_bit(128, 0)          # segmentation off
    A.put_bit(128, 0)          # filter type: normal
    A.put_literal(0, 6)        # filter level 0 (no filtering)
    A.put_literal(0, 3)        # sharpness
    A.put_bit(128, 0)          # lf deltas off
    A.put_literal(0, 2)        # log2 partitions = 0 (one token partition)
    A.put_literal(q, 7)        # y_ac_qi
    for _ in range(5):
        A.put_bit(128, 0)      # no quantizer deltas
    A.put_bit(128, 0)          # refresh entropy
    upd = COEFF_UPDATE_PROBS
    for t in range(4):         # no coefficient-probability updates
        for b in range(8):
            for c in range(3):
                for pi in range(11):
                    A.put_bit(int(upd[t, b, c, pi]), 0)
    prob_skip = 128
    A.put_bit(128, 1)          # mb_no_skip_coeff
    A.put_literal(prob_skip, 8)

    probs = COEFF_PROBS
    a_y = np.zeros(mb_w * 4, dtype=np.int32)
    a_u = np.zeros(mb_w * 2, dtype=np.int32)
    a_v = np.zeros(mb_w * 2, dtype=np.int32)
    a_y2 = np.zeros(mb_w, dtype=np.int32)

    for mby in range(mb_h):
        l_y = np.zeros(4, dtype=np.int32)
        l_u = np.zeros(2, dtype=np.int32)
        l_v = np.zeros(2, dtype=np.int32)
        l_y2 = 0
        for mbx in range(mb_w):
            y0, x0 = 1 + mby * 16, 1 + mbx * 16
            c0, cx0 = 1 + mby * 8, 1 + mbx * 8
            have_above, have_left = mby > 0, mbx > 0
            src_y = ys[mby * 16:mby * 16 + 16, mbx * 16:mbx * 16 + 16]
            src_u = us[mby * 8:mby * 8 + 8, mbx * 8:mbx * 8 + 8]
            src_v = vs[mby * 8:mby * 8 + 8, mbx * 8:mbx * 8 + 8]

            # mode decision: min SSE of the raw prediction vs source
            best, ymode = None, DC_PRED
            for m in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                pr = _pred_block(Y, y0, x0, 16, m, have_above, have_left)
                sse = int(((src_y - pr) ** 2).sum())
                if best is None or sse < best:
                    best, ymode = sse, m
            bestc, uvmode = None, DC_PRED
            for m in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                pu = _pred_block(U, c0, cx0, 8, m, have_above, have_left)
                pv = _pred_block(V, c0, cx0, 8, m, have_above, have_left)
                sse = int(((src_u - pu) ** 2).sum()) + \
                    int(((src_v - pv) ** 2).sum())
                if bestc is None or sse < bestc:
                    bestc, uvmode = sse, m

            # transform + quantize (luma DC rides the Y2 WHT block)
            pred_y = _pred_block(Y, y0, x0, 16, ymode, have_above, have_left)
            res_blocks = _split16(src_y - pred_y)
            coeffs = fdct4x4_batch(res_blocks)            # (16, 16) raster
            y2_tok = _quantize_scan(fwht4x4(coeffs[:, 0]), y2_dc, y2_ac, 0)
            y_toks = [_quantize_scan(coeffs[b], y_dc, y_ac, 1)
                      for b in range(16)]
            pred_u = _pred_block(U, c0, cx0, 8, uvmode, have_above, have_left)
            pred_v = _pred_block(V, c0, cx0, 8, uvmode, have_above, have_left)
            cu = fdct4x4_batch(_split8(src_u - pred_u))
            cv = fdct4x4_batch(_split8(src_v - pred_v))
            u_toks = [_quantize_scan(cu[b], uv_dc, uv_ac, 0) for b in range(4)]
            v_toks = [_quantize_scan(cv[b], uv_dc, uv_ac, 0) for b in range(4)]

            skip = (not y2_tok.any() and
                    not any(t.any() for t in y_toks) and
                    not any(t.any() for t in u_toks) and
                    not any(t.any() for t in v_toks))

            # per-MB record in the first partition
            A.put_bit(prob_skip, 1 if skip else 0)
            A.put_tree(KF_YMODE_TREE, KF_YMODE_PROBS, ymode)
            A.put_tree(UV_MODE_TREE, KF_UV_MODE_PROBS, uvmode)

            # dequantized coefficients for the in-loop reconstruction
            ycoef = np.zeros((16, 16), dtype=np.int64)
            y2raw = np.zeros(16, dtype=np.int64)
            for n in range(16):
                y2raw[ZIGZAG[n]] = y2_tok[n] * (y2_dc if n == 0 else y2_ac)
            ycoef[:, 0] = iwht4x4(y2raw)
            for b in range(16):
                for n in range(1, 16):
                    ycoef[b, ZIGZAG[n]] = y_toks[b][n] * y_ac
            ucoef = np.zeros((4, 16), dtype=np.int64)
            vcoef = np.zeros((4, 16), dtype=np.int64)
            for b in range(4):
                for n in range(16):
                    ucoef[b, ZIGZAG[n]] = u_toks[b][n] * \
                        (uv_dc if n == 0 else uv_ac)
                    vcoef[b, ZIGZAG[n]] = v_toks[b][n] * \
                        (uv_dc if n == 0 else uv_ac)

            if skip:
                l_y[:] = 0
                a_y[mbx * 4:mbx * 4 + 4] = 0
                l_u[:] = 0
                a_u[mbx * 2:mbx * 2 + 2] = 0
                l_v[:] = 0
                a_v[mbx * 2:mbx * 2 + 2] = 0
                l_y2 = 0
                a_y2[mbx] = 0
                ycoef[:] = 0
                ucoef[:] = 0
                vcoef[:] = 0
            else:
                ctx = l_y2 + a_y2[mbx]
                n = _encode_coeffs(B, probs[1], ctx, 0, y2_tok)
                nz = 1 if n > 0 else 0
                l_y2 = nz
                a_y2[mbx] = nz
                for b in range(16):
                    r, c = b >> 2, b & 3
                    ctx = l_y[r] + a_y[mbx * 4 + c]
                    n = _encode_coeffs(B, probs[0], ctx, 1, y_toks[b])
                    nz = 1 if n > 1 else 0
                    l_y[r] = nz
                    a_y[mbx * 4 + c] = nz
                for toks, coefs, l_c, a_c in ((u_toks, ucoef, l_u, a_u),
                                              (v_toks, vcoef, l_v, a_v)):
                    for b in range(4):
                        r, c = b >> 1, b & 1
                        ctx = l_c[r] + a_c[mbx * 2 + c]
                        n = _encode_coeffs(B, probs[2], ctx, 0, toks[b])
                        nz = 1 if n > 0 else 0
                        l_c[r] = nz
                        a_c[mbx * 2 + c] = nz

            # in-loop reconstruction (identical arithmetic to the decoder)
            res = idct4x4_batch(ycoef)
            blk = _split16(pred_y) + res
            Y[y0:y0 + 16, x0:x0 + 16] = np.clip(
                _join16(blk), 0, 255).astype(np.uint8)
            for P, pred_c, coefs in ((U, pred_u, ucoef), (V, pred_v, vcoef)):
                res = idct4x4_batch(coefs)
                blk = _split8(pred_c) + res
                P[c0:c0 + 8, cx0:cx0 + 8] = np.clip(
                    _join8(blk), 0, 255).astype(np.uint8)
        Y[y0:y0 + 16, W + 1:W + 5] = Y[y0:y0 + 16, W:W + 1]

    first = A.getvalue()
    toks = B.getvalue()
    if len(first) >= (1 << 19):
        raise ValueError("first partition exceeds the 19-bit size field")
    tag = (0 << 0) | (0 << 1) | (1 << 4) | (len(first) << 5)
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a" + struct.pack("<H", wid) + struct.pack("<H", hgt)
    return head + first + toks


def encode_vp8_rgb(rgb: np.ndarray, quality: int = 75) -> bytes:
    """RGB8 (h, w, 3) -> VP8 key-frame payload at roughly libwebp's
    quality scale (100 = qindex 0, 0 = qindex 127)."""
    qindex = _clamp_q(int(round((100 - quality) * 127 / 100)))
    y, u, v = rgb_to_yuv420(rgb)
    return encode_vp8_frame(y, u, v, qindex=qindex)
