"""PII scanning and redaction — the corpus-safety pass every public
training-data pipeline runs (emails / IP addresses scrubbed before
training). Stateless vectorizable map: compiled patterns at module
level, one streaming pass, no shuffle, text never leaves the task
except as a redaction fingerprint.

Oracle strategy (synthesize-on-both-sides, stages/web.py pattern): the
corpus text is clean lowercase prose, so both sides append deterministic
contamination — an email for doc_id % 5 == 0, an IPv4 for
doc_id % 9 == 0 — then the Python side must FIND and REDACT it with the
real regex kernel while the DuckDB oracle does the same with
regexp_extract_all / regexp_replace. Counts are integers and the
redacted text is compared as md5, so the match is exact.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

# patterns kept within the common RE2/PCRE subset so Python `re` and
# DuckDB RE2 agree on every match
_EMAIL = re.compile(r"[a-z0-9]+@[a-z0-9]+\.[a-z]+")
_IPV4 = re.compile(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}")
EMAIL_PATTERN = _EMAIL.pattern
IPV4_PATTERN = _IPV4.pattern


def synth_contaminated(doc_id: int, text: str) -> str:
    """Deterministic contamination both sides derive identically."""
    t = text
    if doc_id % 5 == 0:
        t += f" contact user{doc_id}@mail{doc_id % 3}.com now"
    if doc_id % 9 == 0:
        t += f" from 10.{doc_id % 256}.0.{doc_id % 100}"
    return t


def scrub_text(text: str) -> tuple[str, int, int]:
    """(redacted_text, n_emails, n_ips): emails replaced first, then
    IPv4s — same order as the oracle."""
    redacted, n_emails = _EMAIL.subn("[EMAIL]", text)
    redacted, n_ips = _IPV4.subn("[IP]", redacted)
    return redacted, n_emails, n_ips


def pii_scan(sf_dir: str):
    """(doc_id, n_emails, n_ips, redacted_md5) per document over the
    deterministically contaminated corpus."""
    from open_parse_ray.stages.analysis import read_documents

    def scan(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        n_em, n_ip, digests = [], [], []
        for d, t in zip(ids, b["text"]):
            red, e, i = scrub_text(synth_contaminated(int(d), t))
            n_em.append(e)
            n_ip.append(i)
            digests.append(hashlib.md5(red.encode()).hexdigest())
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_emails": np.asarray(n_em, dtype=np.int64),
                "n_ips": np.asarray(n_ip, dtype=np.int64),
                "redacted_md5": digests,
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        scan, batch_format="pandas", batch_size=8192
    )
