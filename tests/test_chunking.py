from mergeextractor_spark.operators.chunking import split_text


def test_short_text_single_chunk():
    assert split_text("hello world", 100, 20) == ["hello world"]


def test_chunks_respect_size():
    text = "\n\n".join(
        f"Paragraph {i}. " + ("word " * 40) for i in range(30)
    )
    chunks = split_text(text, 256, 64)
    assert len(chunks) > 1
    assert all(len(c) <= 256 for c in chunks)
    assert all(c.strip() for c in chunks)


def test_overlap_carries_context():
    text = " ".join(f"tok{i:03d}" for i in range(200))
    chunks = split_text(text, 100, 30)
    # consecutive chunks share at least one token (the overlap carry-back)
    for a, b in zip(chunks, chunks[1:]):
        assert set(a.split()) & set(b.split())


def test_all_content_preserved_in_order():
    text = " ".join(f"tok{i:03d}" for i in range(150))
    chunks = split_text(text, 120, 20)
    seen = []
    for c in chunks:
        for tok in c.split():
            if not seen or tok > seen[-1]:
                seen.append(tok)
    assert seen == [f"tok{i:03d}" for i in range(150)]


def test_unsplittable_run_falls_through_to_chars():
    text = "x" * 500
    chunks = split_text(text, 100, 10)
    assert all(len(c) <= 100 for c in chunks)
    assert "".join(chunks).count("x") >= 500  # overlap may duplicate


def test_paragraph_separator_preferred():
    text = "para one content here.\n\npara two content here.\n\npara three content here."
    chunks = split_text(text, 30, 5)
    # paragraphs stay intact (split on \n\n, not mid-word)
    assert any("para one" in c for c in chunks)
    assert any("para three" in c for c in chunks)
