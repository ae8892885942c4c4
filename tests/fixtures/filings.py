"""Synthetic deal + filing fixtures exercising the reference's edge cases
(FIXTURES.md §2): parenthesized names, hyphenated names, domain-like names,
TOC blocks vs real sections, bare-'Background' fallback, abbreviation
enrichment. All text is original — it mirrors the *shapes* the reference
handles (SURVEY §2.2, §2.8), not its data.
"""

from __future__ import annotations

import textwrap


def wrap(text: str, width: int = 72) -> str:
    """Real filings wrap prose at terminal width; the TOC heuristics
    (ChunkProcessor.py:116-140) depend on consecutive non-empty lines."""
    return "\n".join(
        textwrap.fill(p.strip(), width) for p in text.split("\n\n") if p.strip()
    )


NARRATIVE = (
    "On March 5, 2002, representatives of the two companies met in New York "
    "to discuss a potential business combination. The discussions were "
    "initiated by {initiator}. During April 2002 the boards exchanged "
    "financial projections and retained outside counsel. On May 14, 2002, "
    "the board of directors approved the proposed terms in order to "
    "{reason}. Throughout the summer the parties negotiated the exchange "
    "ratio, termination provisions and employee retention arrangements, "
    "and on September 9, 2002 the definitive agreement was executed and "
    "publicly announced before the opening of trading."
)

TOC_BLOCK = (
    "TABLE OF CONTENTS\n"
    "\n"
    "Summary of the Transaction....3\n"
    "\n"
    "Background of the Merger....17\n"
    "\n"
    "Opinion of the Financial Advisor....24\n"
    "\n"
    "Interests of Directors....31\n"
    "\n"
)


def _filing(
    company_a: str,
    company_b: str,
    title: str,
    narrative: str,
    extra: str = "",
    toc: str | None = None,
) -> str:
    header = (
        f"SECURITIES AND EXCHANGE COMMISSION\nWashington, D.C. 20549\n\n"
        f"PREM14A\n\n"
        + wrap(
            f"Joint proxy statement of {company_a} and {company_b} "
            "relating to the proposed transaction described herein."
        )
        + "\n\n"
    )
    section = f"{title}\n\n{wrap(narrative)}\n\n"
    filler_para = wrap(
        "Certain statements in this document constitute forward-looking "
        "statements within the meaning of the federal securities laws and "
        "are subject to risks and uncertainties that could cause actual "
        "results to differ materially from those expressed herein."
    )
    filler = "\n\n".join([filler_para] * 4)
    toc = TOC_BLOCK if toc is None else toc
    return header + toc + extra + filler + "\n\n" + section + filler


DEALS = [
    # (main_index, announcement_date M/d/yyyy, company_a, company_b)
    (0, "9/9/2002", "Alpha Data Systems Inc", "Beta Merge Corp"),
    (1, "10/31/2001", "CyBear Inc(Andryx Corp)", "Gamma Holdings Inc"),
    (2, "12/30/2004", "Epsilon-Tech Corp", "Mediconsult.com Inc"),
    (3, "2/28/2001", "Delta Partners Inc", "Omega Capital Corp"),
    (4, "1/15/2001", "NoSection Industries", "Silent Partner Co"),
    (5, "11/5/2000", "Quantisys Materials Inc", "Vertex Assembly Corp"),
]


def _doc(idx: int, a: str, b: str, body: str) -> dict:
    return {
        "main_index": idx,
        "company_a": a,
        "company_b": b,
        "url": f"https://www.sec.gov/Archives/edgar/data/{1000 + idx}/000100{idx}.txt",
        "content": body,
    }


def build_filings() -> list[dict]:
    docs = []
    # 0: the straightforward positive case.
    docs.append(
        _doc(
            0,
            "Alpha Data Systems Inc",
            "Beta Merge Corp",
            _filing(
                "Alpha Data Systems Inc",
                "Beta Merge Corp",
                "Background of the Merger",
                NARRATIVE.format(
                    initiator="Beta Merge Corp", reason="expand the combined market reach"
                )
                + " Alpha and Beta management teams continued integration planning thereafter.",
            ),
        )
    )
    # 1: parenthesized company name; TOC block must be rejected, the real
    # "Background of the Offer" section later must win.
    docs.append(
        _doc(
            1,
            "CyBear Inc(Andryx Corp)",
            "Gamma Holdings Inc",
            _filing(
                "CyBear Inc",
                "Gamma Holdings Inc",
                "Background of the Offer",
                NARRATIVE.format(
                    initiator="Gamma Holdings Inc", reason="consolidate overlapping operations"
                )
                + " Representatives of CyBear and Gamma met weekly during the period.",
            ),
        )
    )
    # 2: hyphenated + domain-like names; header text uses the de-hyphenated
    # form so only the hyphen→space retry predicate accepts it.
    docs.append(
        _doc(
            2,
            "Epsilon-Tech Corp",
            "Mediconsult.com Inc",
            _filing(
                "Epsilon Tech Corp",
                "Mediconsult.com Inc",
                "Background of the Acquisition",
                NARRATIVE.format(
                    initiator="Epsilon Tech Corp", reason="acquire complementary technology"
                )
                + " Epsilon Tech and Mediconsult continued due diligence through the fall.",
            ),
        )
    )
    # 3: bare "Background" title → only the fallback phrase pass accepts.
    docs.append(
        _doc(
            3,
            "Delta Partners Inc",
            "Omega Capital Corp",
            _filing(
                "Delta Partners Inc",
                "Omega Capital Corp",
                "Background",
                NARRATIVE.format(
                    initiator="Delta Partners Inc", reason="diversify the investment portfolio"
                )
                + " Delta and Omega executives jointly reviewed the proposed structure.",
            ),
        )
    )
    # 4: no background narrative at all → the cascade must yield nothing.
    docs.append(
        _doc(
            4,
            "NoSection Industries",
            "Silent Partner Co",
            (
                "SECURITIES AND EXCHANGE COMMISSION\n\nS-4\n\nRegistration "
                "statement of NoSection Industries and Silent Partner Co.\n\n"
                + TOC_BLOCK
                + ("General corporate information and routine disclosures follow. " * 40)
            ),
        )
    )
    # 5: abbreviation-enrichment path — the narrative only ever says
    # "Quantum Group"; the defining paragraph ties it back. Company token
    # 'quantisys' is absent from the passage, forcing enrichment.
    definition_para = (
        'Quantisys Materials Inc, a Delaware corporation (together with its '
        'subsidiaries, "Quantum Group"), is a producer of advanced ceramics.\n\n'
    )
    narrative5 = (
        "On June 2, 2003, the chief executive of Quantum Group contacted "
        "the counterparty's board to propose a combination. The discussions "
        "were initiated by Quantum Group. Quantum Group retained financial "
        "advisors during July 2003, and the parties executed a "
        "confidentiality agreement. On August 19, 2003, the Quantum Group "
        "board met in order to approve the transaction structure, and the "
        "agreement was signed that evening. Quantum Group and the "
        "counterparty announced the deal the next morning."
    )
    toc5 = (
        "TABLE OF CONTENTS\n\nIntroduction....2\n\nSummary of the "
        "Transaction....3\n\nOpinion of the Financial Advisor....24\n\n"
        "Interests of Directors....31\n\n"
    )
    docs.append(
        _doc(
            5,
            "Quantisys Materials Inc",
            "Vertex Assembly Corp",
            _filing(
                "Quantisys Materials Inc",
                "Vertex Assembly Corp",
                "Background of the Transaction",
                narrative5,
                extra=definition_para,
                toc=toc5,
            ),
        )
    )
    return docs


def deals_csv_lines() -> list[str]:
    """Header-less positional CSV rows (index, date, company_a, company_b)
    mirroring truncatedData.csv usage."""

    def q(s: str) -> str:
        return '"' + s.replace('"', '""') + '"' if "," in s or '"' in s else s

    return [
        f"{i},{d},{q(a)},{q(b)}" for i, d, a, b in DEALS
    ]
