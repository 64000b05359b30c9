"""Bytecode contract classifier (≙ EthContractService,
/root/reference/ethereumetl/service/eth_contract_service.py:38-140):

- ``get_function_sighashes``: scan EVM bytecode for PUSH4 operands (the
  dispatcher's function selectors). PUSH1..PUSH32 opcodes carry inline
  operand bytes that must be skipped — a stateful byte walk, so it runs
  as an Arrow-batched ``mapInPandas`` (per-contract O(len) work, no
  shuffle; the one genuinely iterative decode on this surface).
- ``is_erc20`` / ``is_erc721``: the reference's selector-set heuristics
  as pure JVM array_contains expressions over the sighash column.

Selectors are keccak256(signature)[:4]; keccak-f[1600] is implemented
here (public algorithm, FIPS draft / Ethereum yellow paper) because the
image has no eth_utils — it runs ONCE per signature at plan build time,
never per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------- keccak256
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_M = (1 << 64) - 1


def _rol(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & _M


def _keccak_f(a: list[list[int]]) -> None:
    for rc in _RC:
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(a[x][y], _ROT[x][y])
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        a[0][0] ^= rc


def keccak256(data: bytes) -> bytes:
    """keccak256 (the pre-NIST padding Ethereum uses, NOT sha3-256)."""
    rate = 136
    a = [[0] * 5 for _ in range(5)]
    padded = data + b"\x01" + b"\x00" * (rate - (len(data) % rate) - 1)
    padded = padded[:-1] + bytes([padded[-1] | 0x80])
    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[8 * i : 8 * i + 8], "little")
            a[i % 5][i // 5] ^= lane
        _keccak_f(a)
    out = b""
    for y in range(5):
        for x in range(5):
            out += a[x][y].to_bytes(8, "little")
            if len(out) >= 32:
                return out[:32]
    return out[:32]


def sighash(signature: str) -> str:
    """≙ get_function_sighash (eth_contract_service.py:138-140)."""
    return "0x" + keccak256(signature.encode()).hex()[:8]


ERC20_REQUIRED = [
    "totalSupply()", "decimals()", "balanceOf(address)",
    "transfer(address,uint256)", "transferFrom(address,address,uint256)",
    "approve(address,uint256)", "allowance(address,address)",
]
ERC721_REQUIRED = ["balanceOf(address)", "ownerOf(uint256)", "approve(address,uint256)"]
ERC721_TRANSFER_ANY = [
    "transfer(address,uint256)", "transferFrom(address,address,uint256)",
    "safeTransferFrom(address,address,uint256)",
    "safeTransferFrom(address,address,uint256,bytes)",
]


def push4_sighashes(bytecode_hex: str) -> list[str]:
    """PUSH4 operands of one bytecode string — the dispatcher selector
    walk (skips PUSH1..PUSH32 inline operands; ≙ get_function_sighashes,
    eth_contract_service.py:42-62)."""
    h = bytecode_hex[2:] if bytecode_hex.startswith("0x") else bytecode_hex
    if not h:
        return []
    try:
        code = bytes.fromhex(h)
    except ValueError:
        return []
    out: set[str] = set()
    i = 0
    n = len(code)
    while i < n:
        op = code[i]
        if 0x60 <= op <= 0x7F:  # PUSH1..PUSH32
            width = op - 0x5F
            if op == 0x63 and i + 5 <= n:  # full 4 operand bytes present
                out.add("0x" + code[i + 1 : i + 5].hex())
            i += 1 + width
        else:
            i += 1
    return sorted(out)


def extract_sighashes(df: DataFrame, bytecode_col: str = "bytecode") -> DataFrame:
    """Add ``function_sighashes: array<string>`` via Arrow-batched scan."""
    import pyspark.sql.types as T

    out_schema = T.StructType(
        [*df.schema.fields, T.StructField("function_sighashes", T.ArrayType(T.StringType()))]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["function_sighashes"] = pdf[bytecode_col].map(push4_sighashes)
            yield pdf

    return df.mapInPandas(gen, out_schema)


def _implements(col: Column, sig: str) -> Column:
    return F.array_contains(col, sighash(sig))


def is_erc20_expr(sighashes: Column | str = "function_sighashes") -> Column:
    """≙ is_erc20_contract (eth_contract_service.py:66-78)."""
    c = F.col(sighashes) if isinstance(sighashes, str) else sighashes
    out = F.lit(True)
    for s in ERC20_REQUIRED:
        out = out & _implements(c, s)
    return out & ~_implements(c, "tokenURI(uint256)")


def is_erc721_expr(sighashes: Column | str = "function_sighashes") -> Column:
    """≙ is_erc721_contract (eth_contract_service.py:89-101)."""
    c = F.col(sighashes) if isinstance(sighashes, str) else sighashes
    out = F.lit(True)
    for s in ERC721_REQUIRED:
        out = out & _implements(c, s)
    any_xfer = F.lit(False)
    for s in ERC721_TRANSFER_ANY:
        any_xfer = any_xfer | _implements(c, s)
    return out & any_xfer & ~_implements(c, "decimals()")


def classify_contracts(df: DataFrame, bytecode_col: str = "bytecode") -> DataFrame:
    """bytecode → function_sighashes + is_erc20/is_erc721 (the
    trace→contract→token branch's classification step)."""
    withsig = extract_sighashes(df, bytecode_col)
    return withsig.withColumn("is_erc20", is_erc20_expr()).withColumn(
        "is_erc721", is_erc721_expr()
    )
