"""Format sniffing and record parsing: FASTQ / FASTA / SAM (BAM arrives as SAM
text via the decompression shim).

Replicates the reference's exact record semantics:

* sniffer rules — ntcard.cpp:105-130 (getftype):
  '>' -> FASTA; '@' + {HD,SQ,RG,PG,CO} -> SAM-with-header; '@' otherwise ->
  FASTQ; else a line whose 2nd and 5th whitespace fields exist and are
  numeric -> headerless SAM (first line is itself the first alignment;
  istringstream leaves missing trailing fields empty, so there is no
  minimum field count); anything else -> error.
* FASTQ — ntcard.cpp:173-189 (getEfq): strict 4-line records (the sniffer
  consumed record 1's header); a record is processed only if its quality
  line was successfully read.
* FASTA — ntcard.cpp:191-208 (getEfa): wrapped sequence lines concatenated
  until the next '>' (which is discarded); empty records are yielded.
* SAM — ntcard.cpp:210-235 (getEsm): skip '@' header lines, take whitespace
  field 10 (SEQ) of every alignment line; short lines inherit the previous
  line's remaining fields (istringstream >> keeps old values on failure).

Lines are split on '\\n' only — carriage returns are *kept* (C++ getline
semantics), so CRLF input degrades identically to the reference (the '\\r'
hashes as N).
"""

from __future__ import annotations

from typing import IO, Iterator, Optional, Tuple

FASTQ, FASTA, SAM, ERR = 0, 1, 2, 3

_SAM_HEADER_TAGS = (b"HD", b"SQ", b"RG", b"PG", b"CO")


def _getline(stream: IO[bytes]) -> Optional[bytes]:
    """C++ std::getline: strip the trailing newline, keep '\\r'; None at EOF."""
    line = stream.readline()
    if not line:
        return None
    if line.endswith(b"\n"):
        line = line[:-1]
    return line


def _is_number(tok: bytes) -> bool:
    """ntcard.cpp:96-103 isNumber: non-empty, all ASCII digits."""
    return bool(tok) and tok.isdigit()


def sniff(stream: IO[bytes]) -> Tuple[int, Optional[bytes]]:
    """Consume the first line and classify the format (ntcard.cpp:105-130).

    Returns (ftype, first_alignment) where first_alignment is non-None for
    headerless SAM (the consumed line must be parsed as alignment #1)."""
    line = _getline(stream)
    if line is None:
        line = b""
    if line[:1] == b">":
        return FASTA, None
    if line[:1] == b"@":
        if line[1:3] in _SAM_HEADER_TAGS:
            return SAM, None
        return FASTQ, None
    # getftype (ntcard.cpp:124-128): istringstream extraction leaves missing
    # fields empty, so the only requirement is that fields 2 and 5 exist and
    # are numeric — a 5-field line qualifies, there is no 11-field minimum.
    fields = line.split()
    if len(fields) > 4 and _is_number(fields[1]) and _is_number(fields[4]):
        return SAM, line
    return ERR, None


def sniff_lenient(stream: IO[bytes]) -> Tuple[int, Optional[bytes]]:
    """nthll's sniffer (nthll.cpp:70-90): same as :func:`sniff` except any
    non-'>'/'@' first line is treated as a headerless SAM alignment with NO
    11-field sanity check — there is no error path."""
    line = _getline(stream)
    if line is None:
        line = b""
    if line[:1] == b">":
        return FASTA, None
    if line[:1] == b"@":
        if line[1:3] in _SAM_HEADER_TAGS:
            return SAM, None
        return FASTQ, None
    return SAM, line


def fastq_records(stream: IO[bytes]) -> Iterator[bytes]:
    """4-line FASTQ records; the first header line was consumed by sniff()."""
    while True:
        seq = _getline(stream)
        _getline(stream)  # '+'
        qual = _getline(stream)
        if qual is None:
            return
        yield seq if seq is not None else b""
        if _getline(stream) is None:  # next record's header
            return


def fasta_records(stream: IO[bytes]) -> Iterator[bytes]:
    """Wrapped FASTA records; the first '>' line was consumed by sniff()."""
    good = True
    while good:
        parts = []
        line = _getline(stream)
        while line is not None and line[:1] != b">":
            parts.append(line)
            line = _getline(stream)
        good = line is not None
        yield b"".join(parts)


def sam_records(
    stream: IO[bytes], first_alignment: Optional[bytes]
) -> Iterator[bytes]:
    """SEQ fields of SAM alignment lines."""
    if first_alignment is None:
        # skip header lines (ntcard.cpp:220-224)
        line = _getline(stream)
        while line is not None and line[:1] == b"@":
            line = _getline(stream)
        if line is None:
            return
    else:
        line = first_alignment
    # The reference's field variables live outside the loop; a short line's
    # missing fields keep the previous line's values (ntcard.cpp:218-234).
    fields = [b""] * 11
    while True:
        toks = line.split()
        n = min(len(toks), 11)
        fields[:n] = toks[:n]
        yield fields[9]
        line = _getline(stream)
        if line is None:
            return


def records_from_stream(
    stream: IO[bytes], path: str = "<stream>", lenient: bool = False
) -> Iterator[bytes]:
    """Sniff and iterate sequence records; raises ValueError on unknown
    format (the reference prints 'Error in reading file' and exits,
    ntcard.cpp:459-462). ``lenient`` selects nthll's no-error sniffer."""
    ftype, first = (sniff_lenient if lenient else sniff)(stream)
    if ftype == FASTQ:
        yield from fastq_records(stream)
    elif ftype == FASTA:
        yield from fasta_records(stream)
    elif ftype == SAM:
        yield from sam_records(stream, first)
    else:
        raise ValueError(f"Error in reading file: {path}")


def expand_file_args(args) -> list:
    """'@list' arguments expand to one path per line of the list file
    (ntcard.cpp:415-425). Every line is taken verbatim (even empty ones,
    which later fail to open — matching the reference)."""
    paths = []
    for a in args:
        if a.startswith("@"):
            with open(a[1:], "r") as fh:
                for line in fh:
                    paths.append(line.rstrip("\n"))
        else:
            paths.append(a)
    return paths
