"""Bit-exact ChaCha20 RNG matching Rust's `rand_chacha::ChaCha20Rng`.

The reference generates all MantaPay parameters deterministically from a
32-byte seed through `ChaCha20Rng::from_seed`
(reference `manta-pay/src/parameters.rs:49-91`). Reproducing those samples
requires a bit-exact word stream: `rand_chacha` emits the raw ChaCha20
keystream as little-endian u32 words over 64-byte blocks with the RFC-7539
constants, a zero stream id, and a 64-bit block counter starting at 0.

`next_u64` takes two consecutive u32 words as (low, high); `fill_bytes`
reads the byte stream. This matches rand_chacha 0.3 (BlockRng semantics:
u64 reads are aligned to even word indices is NOT done — rand_core's
BlockRng just takes the next two words, except when only one word remains
in the block, in which case it combines across blocks; we reproduce the
exact BlockRng behavior).
"""

from __future__ import annotations

import struct

_CONSTANTS = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)
_MASK = 0xFFFFFFFF


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & _MASK


def _quarter_round(state, a, b, c, d):
    state[a] = (state[a] + state[b]) & _MASK
    state[d] = _rotl(state[d] ^ state[a], 16)
    state[c] = (state[c] + state[d]) & _MASK
    state[b] = _rotl(state[b] ^ state[c], 12)
    state[a] = (state[a] + state[b]) & _MASK
    state[d] = _rotl(state[d] ^ state[a], 8)
    state[c] = (state[c] + state[d]) & _MASK
    state[b] = _rotl(state[b] ^ state[c], 7)


def chacha20_block(key_words, counter: int, nonce_words) -> list:
    """One 64-byte ChaCha20 block as 16 u32 words.

    `counter` is the 64-bit block counter (rand_chacha uses a 64-bit counter
    spanning state words 12 and 13, with the 64-bit stream id in words 14-15).
    """
    state = list(_CONSTANTS) + list(key_words) + [
        counter & _MASK,
        (counter >> 32) & _MASK,
        nonce_words[0],
        nonce_words[1],
    ]
    working = list(state)
    for _ in range(10):
        _quarter_round(working, 0, 4, 8, 12)
        _quarter_round(working, 1, 5, 9, 13)
        _quarter_round(working, 2, 6, 10, 14)
        _quarter_round(working, 3, 7, 11, 15)
        _quarter_round(working, 0, 5, 10, 15)
        _quarter_round(working, 1, 6, 11, 12)
        _quarter_round(working, 2, 7, 8, 13)
        _quarter_round(working, 3, 4, 9, 14)
    return [(w + s) & _MASK for w, s in zip(working, state)]


class ChaCha20Rng:
    """rand_chacha-compatible deterministic RNG."""

    def __init__(self, seed: bytes):
        assert len(seed) == 32
        self.key = struct.unpack("<8I", seed)
        self.nonce = (0, 0)  # stream id 0
        self.counter = 0  # 64-bit block counter
        self.block: list = []
        self.index = 16  # force refill

    @classmethod
    def from_seed(cls, seed: bytes) -> "ChaCha20Rng":
        return cls(seed)

    def _refill(self):
        self.block = chacha20_block(self.key, self.counter, self.nonce)
        self.counter += 1
        self.index = 0

    def next_u32(self) -> int:
        if self.index >= 16:
            self._refill()
        word = self.block[self.index]
        self.index += 1
        return word

    def next_u64(self) -> int:
        # rand_core BlockRng: if only one word remains, it reads low from the
        # current block and high from the next (generate_and_set(0) then read).
        if self.index >= 16:
            self._refill()
        if self.index == 15:
            low = self.block[15]
            self._refill()
            high = self.block[0]
            self.index = 1
        else:
            low = self.block[self.index]
            high = self.block[self.index + 1]
            self.index += 2
        return (high << 32) | low

    def fill_bytes(self, n: int) -> bytes:
        # rand_core BlockRng::fill_bytes consumes the remaining words of the
        # current block as LE bytes, then whole blocks as needed; a partial
        # word at the end consumes the entire word.
        out = bytearray()
        while len(out) < n:
            if self.index >= 16:
                self._refill()
            while self.index < 16 and len(out) < n:
                word_bytes = struct.pack("<I", self.block[self.index])
                take = min(4, n - len(out))
                out += word_bytes[:take]
                self.index += 1
        return bytes(out)
