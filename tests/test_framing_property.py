"""Property-based framing tests (hypothesis): however a message stream is
cut into chunks, sequentially extracting with buffer carry-over yields
exactly the original messages — the invariant behind the reference's
partial/stitch unit tests (proxy_test.exs:85-111), generalized."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from trike_spark.streaming.framing import EOT, extract

# message payloads never contain EOT (trike's framing assumption)
messages = st.lists(
    st.text(alphabet=st.characters(blacklist_characters=EOT), max_size=30),
    min_size=0,
    max_size=10,
)


@given(messages, st.data())
@settings(max_examples=200, deadline=None)
def test_any_chunking_reassembles_exactly(msgs, data):
    stream = "".join(m + EOT for m in msgs)
    # cut the stream at arbitrary positions
    n_cuts = data.draw(st.integers(min_value=0, max_value=6))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(stream)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    chunks = []
    prev = 0
    for c in cuts + [len(stream)]:
        chunks.append(stream[prev:c])
        prev = c

    got: list[str] = []
    buffer = ""
    for chunk in chunks:
        out, buffer = extract(buffer + chunk)
        got.extend(out)
    assert got == msgs
    assert buffer == ""  # fully terminated stream leaves no residue


@given(messages, st.text(alphabet=st.characters(blacklist_characters=EOT), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_trailing_partial_stays_buffered(msgs, partial):
    stream = "".join(m + EOT for m in msgs) + partial
    out, buffer = extract(stream)
    assert out == msgs
    assert buffer == partial
