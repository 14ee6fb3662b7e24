"""Order-agnostic bytesum — uint64 wrap-around sum of all bytes.

Reference: SumWriter/ByteSum (/root/reference/internal/common/hash.go:29-51),
used as a sidecar hash for release graphs precisely because object-store
streaming has no stable order — which makes it commutative + associative and
therefore an *exact* distributed aggregate in Spark (per-row byte sums, then
a global sum, mod 2^64).

The reference's gzip'd variant hashes compressed bytes; a distributed concat
has no canonical compressed stream, so this engine hashes the uncompressed
canonical line set instead (documented deviation, see SURVEY.md §2 row 25).
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1


def bytesum(data: bytes) -> int:
    return sum(data) & MASK64


def bytesum_lines(lines: list[str]) -> int:
    """Bytesum of a release file formed by joining lines with trailing
    newlines — order-agnostic because addition commutes."""
    total = 0
    for line in lines:
        total += sum(line.encode("utf-8")) + 10  # +10 for the '\n'
    return total & MASK64
