"""Jolt zkVM example: prove a Fibonacci guest end-to-end.

Mirrors the reference's `co-jolt/examples/fibonacci` (a `#[jolt::provable]
fn fib(n)` guest): the guest below computes fib(N) in registers with a
backward branch, the tracer executes it, and `jolt.prove` emits one linked
proof (Lasso instruction lookups + bytecode/register/RAM memory checking +
uniform Spartan step constraints + a single batched PST13 opening).

Run: python examples/fibonacci.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from co_zkvms_tpu.models.jolt import jolt, rv32i as rv, subtables as ST
from co_zkvms_tpu.ops import pst13


def fib_guest(n: int):
    """fib(n) via ADD/branch loop: r10 <- fib(n). 16-bit-word safe."""
    return [
        rv.asm("ADDI", rd=5, rs1=0, imm=n),     # counter
        rv.asm("ADDI", rd=10, rs1=0, imm=0),    # a = 0
        rv.asm("ADDI", rd=11, rs1=0, imm=1),    # b = 1
        # loop:
        rv.asm("ADD", rd=12, rs1=10, rs2=11),   # sum = a + b
        rv.asm("ADD", rd=10, rs1=11, rs2=0),    # a = b
        rv.asm("ADD", rd=11, rs1=12, rs2=0),    # b = sum
        rv.asm("ADDI", rd=5, rs1=5, imm=-1),
        rv.asm("BNE", rs1=5, rs2=0, imm=-16),   # back to loop
        rv.asm("ECALL"),
    ]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ST.set_config(8)  # 16-bit guest words keep subtables example-sized
    program = fib_guest(n)

    emu = rv.Emulator(program)
    emu.run()
    fib = emu.regs[10]
    print(f"guest executed: {len(emu.trace)} steps")

    srs = pst13.setup_cached(8, seed=21)
    t0 = time.time()
    proof = jolt.prove(program, srs, mem_bits=4)
    print(f"proved in {time.time() - t0:.1f}s")

    t0 = time.time()
    ok = jolt.verify(proof, program, srs)
    print(f"verified={ok} in {time.time() - t0:.1f}s")
    assert ok
    print(f"fib({n}) = {fib}")


if __name__ == "__main__":
    main()
