"""Build the sha2-chain RV32IM guest ELF fixture.

A REAL program, not a synthetic opcode sampler: a full SHA-256 compression
function (FIPS 180-4) in RV32I assembly — 64 unrolled rounds with the
message schedule kept in registers, K constants materialized inline
(LUI/ADDI), the running digest chained through RAM — iterated N times over
its own 32-byte digest. This is the same workload as the reference's
``sha2-chain`` guest crate (co-jolt/examples/sha2-chain/guest/src), which
is its headline benchmark (BASELINE.md traces).

The image has no RISC-V cross-toolchain (and zero egress), so the fixture
is assembled by this script with the framework's own encoder
(models/jolt/rv32i.asm, round-trip-tested against decode) and emitted as a
standards-conformant ELF32/EM_RISCV executable (models/jolt/elf.py). The
program is validated two independent ways before the fixture is written:
the traced emulator digest must equal hashlib.sha256 chained N times, and
the ELF must round-trip through elf.load_guest.

Usage: python tools/make_sha2_guest.py [N] [out.elf]
"""

import hashlib
import struct
import sys

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__file__), ".."))

from co_zkvms_tpu.models.jolt import elf as E
from co_zkvms_tpu.models.jolt import rv32i as rv

K = [
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
]
IV = [0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
      0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19]
SEED = [0x00000001, 0x00000002, 0x00000003, 0x00000004,
        0x00000005, 0x00000006, 0x00000007, 0x00000008]

CODE_BASE = 0x400
RAM_BASE = 0x100
MEM_BITS = 5            # 32 RAM word slots
OUT_BITS = 3            # top 8 slots = output region (JoltDevice)
DIGEST_SLOT = 0         # digest lives in slots 0..7
OUT_SLOT = (1 << MEM_BITS) - (1 << OUT_BITS)   # 24..31

# registers: x1..x8 = working vars a..h (by renaming), x9..x24 = W[0..15],
# x25 t1, x26 t2, x27/x28/x31 scratch, x30 chain counter, x29 unused
W = [9 + i for i in range(16)]
T1, T2, S3, S4, S5 = 25, 26, 27, 28, 31
CTR = 30


def ref_chain(seed_words, n):
    """hashlib ground truth: digest_{k+1} = sha256(digest_k as 32 BE bytes)."""
    d = list(seed_words)
    for _ in range(n):
        msg = b"".join(struct.pack(">I", w) for w in d)
        d = list(struct.unpack(">8I", hashlib.sha256(msg).digest()))
    return d


class Asm:
    def __init__(self):
        self.words = []

    def emit(self, op, **kw):
        self.words.append(rv.asm(op, **kw))

    def pc(self):
        return CODE_BASE + 4 * len(self.words)

    def li(self, rd, val):
        """Materialize a 32-bit constant (1-2 instructions)."""
        val &= 0xFFFFFFFF
        sval = val - (1 << 32) if val >> 31 else val
        if -2048 <= sval < 2048:
            self.emit("ADDI", rd=rd, rs1=0, imm=sval)
            return
        hi = (val + 0x800) & 0xFFFFF000
        lo = val - hi
        if lo >= 1 << 31:
            lo -= 1 << 32
        if lo <= -(1 << 31):
            lo += 1 << 32
        self.emit("LUI", rd=rd, imm=hi)
        if lo:
            self.emit("ADDI", rd=rd, rs1=rd, imm=lo)

    def ror(self, dst, src, k, scratch):
        """dst = src rotate-right k (dst may alias neither src nor scratch)."""
        self.emit("SRLI", rd=dst, rs1=src, imm=k)
        self.emit("SLLI", rd=scratch, rs1=src, imm=32 - k)
        self.emit("OR", rd=dst, rs1=dst, rs2=scratch)


def build_program(n_chain: int):
    a = Asm()
    # seed digest into RAM slots 0..7
    for i, w in enumerate(SEED):
        a.li(S3, w)
        a.emit("SW", rs1=0, rs2=S3, imm=RAM_BASE + 4 * (DIGEST_SLOT + i))
    a.li(CTR, n_chain)

    loop_top = a.pc()
    # W[0..7] = digest from RAM; W[8..15] = padding for a 32-byte message
    for i in range(8):
        a.emit("LW", rd=W[i], rs1=0, imm=RAM_BASE + 4 * (DIGEST_SLOT + i))
    a.emit("LUI", rd=W[8], imm=0x80000000)
    for i in range(9, 15):
        a.emit("ADD", rd=W[i], rs1=0, rs2=0)
    a.li(W[15], 256)                     # bit length of the message
    # working vars = IV (x1..x8)
    for i, w in enumerate(IV):
        a.li(1 + i, w)

    s = list(range(1, 9))                # current regs of [a,b,c,d,e,f,g,h]
    for t in range(64):
        if t >= 16:
            wi, w15, w7, w2 = (W[t % 16], W[(t - 15) % 16],
                               W[(t - 7) % 16], W[(t - 2) % 16])
            # sigma0(w15) -> S3
            a.ror(S3, w15, 7, S4)
            a.ror(S4, w15, 18, S5)
            a.emit("XOR", rd=S3, rs1=S3, rs2=S4)
            a.emit("SRLI", rd=S4, rs1=w15, imm=3)
            a.emit("XOR", rd=S3, rs1=S3, rs2=S4)
            # sigma1(w2) -> S4
            a.ror(S4, w2, 17, S5)
            a.ror(S5, w2, 19, T2)
            a.emit("XOR", rd=S4, rs1=S4, rs2=S5)
            a.emit("SRLI", rd=S5, rs1=w2, imm=10)
            a.emit("XOR", rd=S4, rs1=S4, rs2=S5)
            a.emit("ADD", rd=wi, rs1=wi, rs2=S3)
            a.emit("ADD", rd=wi, rs1=wi, rs2=w7)
            a.emit("ADD", rd=wi, rs1=wi, rs2=S4)
        ra, rb, rc, rd_, re, rf, rg, rh = s
        # S1(e) -> S3
        a.ror(S3, re, 6, S4)
        a.ror(S4, re, 11, S5)
        a.emit("XOR", rd=S3, rs1=S3, rs2=S4)
        a.ror(S4, re, 25, S5)
        a.emit("XOR", rd=S3, rs1=S3, rs2=S4)
        # ch(e,f,g) -> S4
        a.emit("AND", rd=S4, rs1=re, rs2=rf)
        a.emit("XORI", rd=S5, rs1=re, imm=-1)
        a.emit("AND", rd=S5, rs1=S5, rs2=rg)
        a.emit("XOR", rd=S4, rs1=S4, rs2=S5)
        # t1 = h + S1 + ch + K[t] + W[t%16]
        a.emit("ADD", rd=T1, rs1=rh, rs2=S3)
        a.emit("ADD", rd=T1, rs1=T1, rs2=S4)
        a.li(S5, K[t])
        a.emit("ADD", rd=T1, rs1=T1, rs2=S5)
        a.emit("ADD", rd=T1, rs1=T1, rs2=W[t % 16])
        # S0(a) -> S3
        a.ror(S3, ra, 2, S4)
        a.ror(S4, ra, 13, S5)
        a.emit("XOR", rd=S3, rs1=S3, rs2=S4)
        a.ror(S4, ra, 22, S5)
        a.emit("XOR", rd=S3, rs1=S3, rs2=S4)
        # maj(a,b,c) -> S4
        a.emit("AND", rd=S4, rs1=ra, rs2=rb)
        a.emit("AND", rd=S5, rs1=ra, rs2=rc)
        a.emit("XOR", rd=S4, rs1=S4, rs2=S5)
        a.emit("AND", rd=S5, rs1=rb, rs2=rc)
        a.emit("XOR", rd=S4, rs1=S4, rs2=S5)
        a.emit("ADD", rd=T2, rs1=S3, rs2=S4)       # t2 = S0 + maj
        a.emit("ADD", rd=rd_, rs1=rd_, rs2=T1)     # reg(d) becomes new e
        a.emit("ADD", rd=rh, rs1=T1, rs2=T2)       # reg(h) becomes new a
        s = [rh, ra, rb, rc, rd_, re, rf, rg]
    assert s == list(range(1, 9)), "64 rounds returns to identity mapping"
    # digest = IV + working vars (each iteration is a fresh one-block hash)
    for i in range(8):
        a.li(S3, IV[i])
        a.emit("ADD", rd=S3, rs1=S3, rs2=s[i])
        a.emit("SW", rs1=0, rs2=S3, imm=RAM_BASE + 4 * (DIGEST_SLOT + i))
    # chain loop
    a.emit("ADDI", rd=CTR, rs1=CTR, imm=-1)
    a.emit("BEQ", rs1=CTR, rs2=0, imm=8)           # done -> skip the jump
    a.emit("JAL", rd=0, imm=loop_top - a.pc())
    # reveal digest in the output region (JoltDevice output subcube)
    for i in range(8):
        a.emit("LW", rd=S3, rs1=0, imm=RAM_BASE + 4 * (DIGEST_SLOT + i))
        a.emit("SW", rs1=0, rs2=S3, imm=RAM_BASE + 4 * (OUT_SLOT + i))
    a.emit("ECALL")
    return a.words


def build_and_check(n_chain: int):
    words = build_program(n_chain)
    emu = rv.Emulator(words, base=CODE_BASE, max_steps=1 << 22)
    trace = emu.run()
    got = [int.from_bytes(
        bytes(emu.memory.get(RAM_BASE + 4 * (OUT_SLOT + i) + b, 0)
              for b in range(4)), "little") for i in range(8)]
    want = ref_chain(SEED, n_chain)
    assert got == want, f"guest digest {got} != hashlib {want}"
    return words, len(trace)


def main():
    n_chain = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    out = sys.argv[2] if len(sys.argv) > 2 else (
        f"examples/guests/sha2_chain_{n_chain}.elf")
    words, steps = build_and_check(n_chain)
    blob = E.write_guest_elf(words, CODE_BASE)
    img = E.load_guest(blob)
    assert img.program_words == words and img.code_base == CODE_BASE
    with open(out, "wb") as fh:
        fh.write(blob)
    print(f"sha2-chain x{n_chain}: {len(words)} instructions, "
          f"{steps} trace rows, digest == hashlib.sha256 chain; "
          f"wrote {out} ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
