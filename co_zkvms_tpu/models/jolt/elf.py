"""RV32 ELF ingestion: load a compiled RISC-V guest into the Jolt pipeline.

Maps co-jolt's host layer (host/mod.rs:47-150 + jolt-tracer's ELF decode):
the reference shells out to cargo for riscv32im builds, then decodes the ELF
into the bytecode image the tracer executes. Guest *builds* are out of scope
here (no cross-toolchain in the image — and building is host-side anyway);
what the framework owns is ELF -> (entry, code words, initial memory), which
this module implements natively for ELF32/RISC-V:

- validates ELFCLASS32 / little-endian / EM_RISCV (243);
- maps every PT_LOAD segment (p_vaddr, file bytes + BSS zero-fill);
- extracts the executable segment as the word stream ``jolt.prove`` takes
  and the writable segments as the initial RAM image.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

EM_RISCV = 243
PT_LOAD = 1
PF_X = 1


class Segment(NamedTuple):
    vaddr: int
    data: bytes                 # file bytes + zero fill to p_memsz
    flags: int


class Elf(NamedTuple):
    entry: int
    segments: list              # [Segment]


def parse(blob: bytes) -> Elf:
    if blob[:4] != b"\x7fELF":
        raise ValueError("not an ELF file")
    ei_class, ei_data = blob[4], blob[5]
    if ei_class != 1:
        raise ValueError("need ELFCLASS32 (RV32 guest)")
    if ei_data != 1:
        raise ValueError("need little-endian ELF")
    (e_type, e_machine, _ver, e_entry, e_phoff, _shoff, _flags, _ehsize,
     e_phentsize, e_phnum) = struct.unpack_from("<HHIIIIIHHH", blob, 16)
    if e_machine != EM_RISCV:
        raise ValueError(f"not a RISC-V ELF (e_machine={e_machine})")
    segs = []
    for i in range(e_phnum):
        off = e_phoff + i * e_phentsize
        (p_type, p_offset, p_vaddr, _paddr, p_filesz, p_memsz,
         p_flags, _align) = struct.unpack_from("<IIIIIIII", blob, off)
        if p_type != PT_LOAD:
            continue
        data = blob[p_offset : p_offset + p_filesz]
        data += b"\x00" * (p_memsz - p_filesz)
        segs.append(Segment(vaddr=p_vaddr, data=data, flags=p_flags))
    return Elf(entry=e_entry, segments=segs)


class GuestImage(NamedTuple):
    entry: int
    code_base: int
    program_words: list         # decoded instruction words at code_base
    memory: dict                # initial RAM: word address -> value


def load_guest(blob: bytes) -> GuestImage:
    """ELF bytes -> the inputs jolt.prove consumes.

    The executable PT_LOAD segment becomes the instruction word stream; all
    other PT_LOAD segments seed the initial memory image (word-addressed,
    little-endian)."""
    elf = parse(blob)
    code = None
    memory = {}
    for seg in elf.segments:
        if seg.flags & PF_X:
            if code is not None:
                raise ValueError("multiple executable segments")
            code = seg
        else:
            for i in range(0, len(seg.data), 4):
                word = int.from_bytes(seg.data[i : i + 4].ljust(4, b"\x00"),
                                      "little")
                memory[seg.vaddr + i] = word
    if code is None:
        raise ValueError("no executable segment")
    if len(code.data) % 4:
        raise ValueError("code segment not word-aligned")
    words = [int.from_bytes(code.data[i : i + 4], "little")
             for i in range(0, len(code.data), 4)]
    if not (code.vaddr <= elf.entry < code.vaddr + len(code.data)):
        raise ValueError("entry point outside the executable segment")
    return GuestImage(entry=elf.entry, code_base=code.vaddr,
                      program_words=words, memory=memory)


def write_guest_elf(program_words, code_base: int, entry: int = None,
                    data: dict = None, data_base: int = None) -> bytes:
    """Emit a minimal valid RV32 ELF for a word program (+ optional data
    segment) — the inverse of load_guest, used by examples/tests and as the
    on-disk guest artifact format in lieu of cargo-built crates."""
    code = b"".join(int(w).to_bytes(4, "little") for w in program_words)
    phnum = 1 + (1 if data else 0)
    ehsize, phentsize = 52, 32
    off_code = ehsize + phnum * phentsize
    data_blob = b""
    if data:
        base = data_base if data_base is not None else min(data)
        top = max(data)
        data_blob = bytearray(top + 4 - base)
        for addr, w in data.items():
            data_blob[addr - base : addr - base + 4] = int(w).to_bytes(
                4, "little")
        data_blob = bytes(data_blob)
    hdr = b"\x7fELF" + bytes([1, 1, 1, 0]) + b"\x00" * 8
    hdr += struct.pack("<HHIIIIIHHHHHH", 2, EM_RISCV, 1,
                       entry if entry is not None else code_base,
                       16 + 36, 0, 0, ehsize, phentsize, phnum, 0, 0, 0)
    ph = struct.pack("<IIIIIIII", PT_LOAD, off_code, code_base, code_base,
                     len(code), len(code), PF_X | 4, 4)
    if data:
        ph += struct.pack("<IIIIIIII", PT_LOAD, off_code + len(code),
                          base, base, len(data_blob), len(data_blob), 6, 4)
    return hdr + ph + code + data_blob
