"""ELF guest ingestion (host/mod.rs:47-150 parity): write a minimal RV32
ELF, load it back, and prove the guest end-to-end through jolt."""

import pytest

from co_zkvms_tpu.models.jolt import elf, rv32i as rv


def _words():
    return [
        rv.asm("ADDI", rd=1, rs1=0, imm=5),
        rv.asm("ADDI", rd=2, rs1=0, imm=7),
        rv.asm("ADD", rd=3, rs1=1, rs2=2),
        rv.asm("XOR", rd=4, rs1=3, rs2=1),
    ]


def test_elf_roundtrip():
    words = _words()
    blob = elf.write_guest_elf(words, code_base=0x400,
                               data={0x100: 0xDEADBEEF, 0x104: 17})
    img = elf.load_guest(blob)
    assert img.code_base == 0x400
    assert img.entry == 0x400
    assert img.program_words == list(words)
    assert img.memory[0x100] == 0xDEADBEEF
    assert img.memory[0x104] == 17


def test_elf_rejects_garbage():
    with pytest.raises(ValueError, match="not an ELF"):
        elf.parse(b"\x00" * 64)
    words = _words()
    blob = elf.write_guest_elf(words, code_base=0x400)
    # 64-bit class rejected
    bad = blob[:4] + bytes([2]) + blob[5:]
    with pytest.raises(ValueError, match="ELFCLASS32"):
        elf.parse(bad)
    # wrong machine rejected
    bad = bytearray(blob)
    bad[18] = 62  # EM_X86_64
    with pytest.raises(ValueError, match="RISC-V"):
        elf.parse(bytes(bad))


def test_elf_guest_emulates():
    """The loaded image drives the emulator exactly like raw words."""
    words = _words()
    blob = elf.write_guest_elf(words, code_base=0x400)
    img = elf.load_guest(blob)
    emu = rv.Emulator(img.program_words, base=img.code_base, max_steps=64)
    trace = emu.run()
    assert len(trace) == 4
    assert emu.regs[3] == 12 and emu.regs[4] == 9
