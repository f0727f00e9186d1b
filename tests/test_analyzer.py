"""Tokenizer fixture vectors (StandardAnalyzer chain semantics —
StandardTokenizer.java:155-177, LowerCaseFilter, StopFilter,
FilteringTokenFilter.java:49-62)."""

import pandas as pd

from lucene_solr_spark.analysis.analyzers import (
    ENGLISH_STOP_WORDS,
    tokenize_standard,
    tokenize_standard_with_positions,
    tokenize_whitespace,
)


def toks(text: str) -> list[str]:
    return tokenize_standard(pd.Series([text])).iloc[0]


def toks_pos(text: str):
    return tokenize_standard_with_positions(pd.Series([text])).iloc[0]


def test_stopword_list_is_the_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS
    assert "i" not in ENGLISH_STOP_WORDS  # not in Lucene's list


def test_basic_lowercase_and_stop():
    assert toks("The Quick Brown FOX") == ["quick", "brown", "fox"]


def test_numbers_and_hyphen_split():
    assert toks("state-of-the-art x86 2024") == ["state", "art", "x86", "2024"]


def test_apostrophe_kept():
    assert toks("O'Neil's book") == ["o'neil's", "book"]


def test_position_increments_preserved_over_stops():
    # "the" consumes position 0; kept tokens land at 1 and 3
    assert toks_pos("the quick the fox") == [("quick", 1), ("fox", 3)]


def test_overlong_token_dropped_but_counts_position():
    long_tok = "x" * 300
    assert toks(f"a {long_tok} b") == ["b"]
    # positions: "a"(stop,0) long(dropped,1) "b"(2)
    assert toks_pos(f"a {long_tok} b") == [("b", 2)]


def test_accents_and_unicode():
    assert toks("Café Müller") == ["café", "müller"]


def test_empty_and_whitespace():
    assert toks("") == []
    assert toks("   \n\t ") == []


def test_punctuation_stripped():
    assert toks("hello, world! (really)") == ["hello", "world", "really"]


def test_whitespace_analyzer_no_folding():
    out = tokenize_whitespace(pd.Series(["The  Fox jumps"])).iloc[0]
    assert out == ["The", "Fox", "jumps"]


def test_vectorized_matches_per_row():
    texts = pd.Series(["The quick fox", "", "a b c", "Hello-World 42"])
    batch = tokenize_standard(texts)
    single = [tokenize_standard(pd.Series([t])).iloc[0] for t in texts]
    assert list(batch) == single


# ----------------------------------------------------------------------
# UAX29URLEmailTokenizer analog (standard/UAX29URLEmailTokenizer.java:
# the StandardTokenizer grammar extended with <URL>/<EMAIL> typed
# tokens; we implement the web-text subset — scheme URLs, www. hosts,
# mailbox@domain emails — and pin these vectors)
# ----------------------------------------------------------------------

from lucene_solr_spark.analysis.analyzers import (  # noqa: E402
    tokenize_url_email,
    tokenize_url_email_with_positions,
)


def utoks(text: str) -> list[str]:
    return tokenize_url_email(pd.Series([text])).iloc[0]


def test_url_email_email_is_one_token():
    assert utoks("Contact John.Doe+spam@Mail.Example.COM today") == [
        "contact", "john.doe+spam@mail.example.com", "today"
    ]
    # the standard chain shatters the same mailbox
    assert toks("Contact John.Doe+spam@Mail.Example.COM today") == [
        "contact", "john", "doe", "spam", "mail", "example", "com", "today"
    ]


def test_url_email_scheme_urls_and_www():
    assert utoks("see HTTPS://WWW2.Example.org/p-1?q=a&b=2 or www.foo-bar.com/baz") == [
        "see", "https://www2.example.org/p-1?q=a&b=2", "www.foo-bar.com/baz"
    ]
    assert utoks("ftp://h0st:21/dir/file.txt") == ["ftp://h0st:21/dir/file.txt"]


def test_url_email_plain_words_unchanged_and_stops_advance():
    # non-URL/email text tokenizes exactly like the standard chain,
    # stopped/dropped tokens still advance positions
    assert utoks("The Quick O'Neil's fox") == toks("The Quick O'Neil's fox")
    out = tokenize_url_email_with_positions(
        pd.Series(["the u3@m.example.com the fox"])
    ).iloc[0]
    assert out == [("u3@m.example.com", 1), ("fox", 3)]


def test_url_email_subset_edges():
    # no dotted TLD -> not an email (documented subset); trailing
    # sentence period not consumed; broken scheme falls back to words
    assert utoks("user@localhost") == ["user", "localhost"]
    assert utoks("mail u3@m.example.com.") == ["mail", "u3@m.example.com"]
    assert utoks("http:/broken") == ["http", "broken"]
