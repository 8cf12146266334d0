"""Reference-shaped test fixtures (FIXTURES.md §1) — nested bronze rows
covering the edge cases the reference's real data contains: missing
nested fields, multiple proceedings (duplicate docket tokens), >200-char
descriptions, multiline quoted values, suffix variants, near-duplicate
names, empty URL lists.
"""

from __future__ import annotations

LONG_DESC = "Interconnected VoIP Numbering Authorization " + "x" * 250


def proceeding(name=None, desc=None, bureau=None):
    return {"name": name, "description": desc, "bureau_name": bureau}


def raw_filing(
    sid,
    filer=None,
    date="2024-03-05T12:34:56.000Z",
    stype="APPLICATION",
    status="ACCEPTED",
    proceedings=(),
    authors=(),
    lawfirms=(),
    documents=(),
):
    return {
        "id_submission": sid,
        "date_received": date,
        "date_disseminated": date,
        "submissiontype": {"description": stype} if stype is not None else None,
        "filingstatus": {"description": status} if status is not None else None,
        "proceedings": list(proceedings) or None,
        "filers": [{"name": filer}] if filer else [],
        "authors": [{"name": a} for a in authors],
        "lawfirms": [{"name": f} for f in lawfirms],
        "documents": [{"src": d} for d in documents],
    }


VOIP_PROC = proceeding("24-132", "Interconnected VoIP Numbering Authorization", "WCB")
SECTION_PROC = proceeding("INBOX-52.15", "Request under Section 52.15(g)(3)", "WCB")


#: ~20 nested bronze rows exercising every filter/classify/normalize branch.
RAW_FILINGS = [
    # relevance via description "voip"
    raw_filing("s001", "Stratus Network, LLC", proceedings=[VOIP_PROC],
               documents=["https://docs.fcc.gov/d/1.pdf"]),
    # near-duplicate of s001's filer (plural) — must merge (D8/D9)
    raw_filing("s002", "Stratus Networks, LLC", date="2024-05-01T00:00:00Z",
               stype="SUPPLEMENT", proceedings=[VOIP_PROC]),
    # relevance via docket INBOX-52.15; suffix variant "Inc."
    raw_filing("s003", "Acme Telecom Inc.", proceedings=[SECTION_PROC],
               stype="PETITION FOR DECLARATORY RULING",
               documents=["https://www.fcc.gov/ecfs/document/10101/1"]),
    # same entity, different suffix — must normalize to same key
    raw_filing("s004", "Acme Telecom, L.L.C.", date="2024-06-07T00:00:00Z",
               stype="AMENDMENT", proceedings=[SECTION_PROC]),
    # relevance via "52.15" in description; d/b/a tail stripped
    raw_filing("s005", "Globex Communications d/b/a GloboVoice",
               proceedings=[proceeding("24-200", "Section 52.15(g)(3) request", "WCB")],
               stype="REQUEST"),
    # multiple proceedings → duplicate docket tokens (dedup via array_distinct)
    raw_filing("s006", "Initech Voice Services LLC",
               proceedings=[VOIP_PROC, VOIP_PROC, SECTION_PROC], stype="APPLICATION"),
    # excluded institutional entity (C2)
    raw_filing("s007", "Wireline Competition Bureau", proceedings=[VOIP_PROC]),
    # individual (≤3 tokens, no business keyword) with an application → gated out
    raw_filing("s008", "Jane Q Doe", proceedings=[VOIP_PROC], stype="APPLICATION"),
    # company with only COMMENT filings → no applicant gate pass
    raw_filing("s009", "Hooli Networks LLC", proceedings=[VOIP_PROC], stype="COMMENT"),
    raw_filing("s010", "Hooli Networks LLC", date="2024-02-02T00:00:00Z",
               proceedings=[VOIP_PROC], stype="REPLY TO COMMENTS"),
    # irrelevant proceeding → filtered by C1
    raw_filing("s011", "Irrelevant Corp",
               proceedings=[proceeding("10-90", "Universal service fund", "OEA")]),
    # multiline quoted submission type (CSV quoting edge, FIXTURES §1.2)
    raw_filing("s012", "Vandelay Industries, Inc.", proceedings=[VOIP_PROC],
               stype="ERRATA\n ERRATUM OR ADDENDUM"),
    # second Vandelay filing: applicant type so the entity passes the gate
    raw_filing("s012b", "Vandelay Industries, Inc.",
               date="2024-07-01T00:00:00Z", proceedings=[VOIP_PROC],
               stype="APPLICATION"),
    # >200-char description (truncation, B3) + empty documents
    raw_filing("s013", "Umbrella VoIP Partners LP",
               proceedings=[proceeding("24-300", LONG_DESC, "WCB")],
               stype="APPLICATION"),
    # missing nested fields entirely (safe_get path, B1)
    raw_filing("s014", "Wayne Enterprises Communications",
               proceedings=[VOIP_PROC], stype=None, status=None),
    # blank filer name → dropped by the C7 guard
    raw_filing("s015", None, proceedings=[VOIP_PROC]),
    # unparseable date → null-on-coerce (Data_Insights.py:36)
    raw_filing("s016", "Pied Piper Telecom LLC", date="not-a-date",
               proceedings=[VOIP_PROC], stype="APPLICATION"),
    # adversarial near-miss pair at levenshtein 3 — must NOT merge
    raw_filing("s017", "Zeta Communications LLC", proceedings=[VOIP_PROC],
               stype="APPLICATION"),
    raw_filing("s018", "Zetamax Communications LLC", proceedings=[VOIP_PROC],
               stype="APPLICATION"),
]
