"""Public-API snapshot test.

Analog of the reference's apidoc CI lint (apidoc/tests/public_api_doc.rs:3-6
with ZEN_API_DOC=check): the committed snapshot in docs/public-api/ must
match the live surface, so accidental API breakage fails loudly.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


def test_api_surface_snapshot_current():
    from gen_api_doc import OUT_PATH, generate

    assert OUT_PATH.exists(), (
        "missing API snapshot; run python tools/gen_api_doc.py"
    )
    live = generate()
    committed = OUT_PATH.read_text()
    assert live == committed, (
        "public API surface changed; regenerate the snapshot with "
        "python tools/gen_api_doc.py and review the diff"
    )
