"""PII detection and redaction — pure regexp column expressions.

Scrubbing obvious personal identifiers (emails, IP addresses,
phone-like numbers) is a standard pass before a web corpus becomes
training data (C4/Dolma-style pipelines run exactly this class of
regex scrub). All patterns are shared Java-regex/RE2 syntax — no
lookarounds, no backreferences — so the DuckDB oracle applies the
SAME strings and the gate stays hash-exact, and everything is
JVM-side codegen'd (no UDF, zero shuffles).

Honest scope: these are the high-precision regex classes. Names,
addresses, and contextual identifiers need an NER pass — which this
engine also has (``extract_entities`` with person/location labels);
compose both for a full scrub.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, functions as F

# shared Java/RE2 subset; order of application matters (emails first:
# their local/domain parts contain digit runs the other patterns
# could partially claim)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# phone-LIKE: international-ish digit runs with up to two separator
# chars between digits ("+1 (555) 123-4567" has ") " runs), 8+ digits
# total — a deterministic heuristic (plain long numbers match too;
# the redaction trades recall over precision, the right direction for
# a scrub). The whitespace class is spelled out, NOT \s: Java's \s
# includes vertical tab while RE2's does not, and a shorthand that
# differs between engines would break the shared-regex oracle
# contract on real text.
PHONE_RE = r"\+?\d(?:[ \t\n\r\f().-]{0,2}\d){7,14}"

EMAIL_TOKEN, IP_TOKEN, PHONE_TOKEN = "<EMAIL>", "<IP>", "<PHONE>"


def pii_counts(text: Column) -> Dict[str, Column]:
    """Per-document match counts, class-DISJOINT: each class is
    counted on the text with the higher-precedence classes already
    redacted (email → ip → phone), so a span is counted exactly once
    and the counts equal what :func:`redact_pii` replaces — a dotted
    quad is an IP, not also a phone (its digit run would match the
    phone pattern on the raw text)."""
    after_email = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IP_RE, IP_TOKEN)
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)),
        "n_ips": F.size(
            F.regexp_extract_all(after_email, F.lit(IP_RE), 0)
        ),
        "n_phones": F.size(
            F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0)
        ),
    }


def redact_pii(text: Column) -> Column:
    """Text with every match replaced by its class token. Application
    order email → ip → phone is part of the contract (and of the
    oracle): emails are consumed before their digit runs can be
    claimed as phone fragments, IPs before phone (dotted quads would
    otherwise match the phone separator class)."""
    c = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    c = F.regexp_replace(c, IP_RE, IP_TOKEN)
    return F.regexp_replace(c, PHONE_RE, PHONE_TOKEN)


def pii_columns(text: Column) -> Dict[str, Column]:
    """Counts plus the redacted text, as named columns."""
    out = pii_counts(text)
    out["redacted_text"] = redact_pii(text)
    out["has_pii"] = (
        (out["n_emails"] + out["n_ips"] + out["n_phones"]) > 0
    )
    return out
