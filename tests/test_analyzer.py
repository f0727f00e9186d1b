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


# --- UAX#29 CJK / Southeast-Asian token types (StandardTokenizer.java:
# 34-52 type constants: IDEOGRAPHIC and HIRAGANA emit one token PER
# CHARACTER; KATAKANA, HANGUL, and SOUTHEAST_ASIAN emit script RUNS) ---


def test_ideographic_one_token_per_char():
    assert toks("中文处理") == ["中", "文", "处", "理"]
    assert toks("Spark入門") == ["spark", "入", "門"]  # mixed-script split


def test_hiragana_single_katakana_runs():
    assert toks("ひらがな") == ["ひ", "ら", "が", "な"]
    assert toks("東京タワー") == ["東", "京", "タワー"]


def test_hangul_and_seasian_runs():
    assert toks("한국어 테스트") == ["한국어", "테스트"]
    assert toks("สวัสดีครับ") == ["สวัสดีครับ"]  # Thai run, no dictionary split


def test_cjk_positions_advance_per_token():
    assert toks_pos("the 中文 fox") == [("中", 1), ("文", 2), ("fox", 3)]


def test_cjk_jvm_engine_parity(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.jvm import (
        standard_tokens_col,
        standard_tokens_pos_col,
        url_email_tokens_col,
    )
    from lucene_solr_spark.analysis.analyzers import tokenize_url_email

    texts = [
        "Spark入門 東京タワー 한국어 테스트 ひらがな日本語 สวัสดีครับ abc_def O'Neil's",
        "カタカナＡＢＣ 中文处理 ㄱㄴ the a https://Example.com/x?a=1 bob@x.org",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    jvm = [r[0] for r in df.select(standard_tokens_col(F.col("text"))).collect()]
    pdv = list(tokenize_standard(pd.Series(texts)))
    assert jvm == pdv
    jvm_p = [
        [(s["term"], s["pos"]) for s in r[0]]
        for r in df.select(standard_tokens_pos_col(F.col("text"))).collect()
    ]
    pdv_p = list(tokenize_standard_with_positions(pd.Series(texts)))
    assert jvm_p == pdv_p
    jvm_u = [r[0] for r in df.select(url_email_tokens_col(F.col("text"))).collect()]
    assert jvm_u == list(tokenize_url_email(pd.Series(texts)))


def test_cjk_end_to_end_index_and_search(spark, tmp_path):
    """CJK terms flow through the full build->search path: ideographs
    index as single-char terms, katakana/hangul as runs; BM25 ranks the
    doc with higher tf first."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.searcher import IndexSearcher
    from lucene_solr_spark.search.query import BooleanAnd, TermQuery

    rows = [
        (0, "東京 タワー visit 東京"),
        (1, "東京 one mention"),
        (2, "大阪 タワー only"),
        (3, "한국어 문서"),
    ]
    src = spark.createDataFrame(rows, ["doc_id", "text"])
    out = str(tmp_path / "cjk_ix")
    build_index(spark, src, out, IndexConfig(n_shards=2, segs_per_shard=2))
    s = IndexSearcher(spark, out)
    hits = s.search(TermQuery("東"), k=5).collect()
    assert [r.doc_id for r in hits] == [0, 1]  # tf=2 beats tf=1
    assert [r.doc_id for r in s.search(TermQuery("タワー"), k=5).collect()] == [2, 0] or \
           [r.doc_id for r in s.search(TermQuery("タワー"), k=5).collect()] == [0, 2]
    assert [r.doc_id for r in s.search(BooleanAnd(("東", "タワー")), k=5).collect()] == [0]
    assert [r.doc_id for r in s.search(TermQuery("한국어"), k=5).collect()] == [3]


# --- ASCIIFoldingFilter analog (standard_folding chain) ---


def test_fold_ascii_cases():
    from lucene_solr_spark.analysis.analyzers import tokenize_standard_folding

    def ftoks(text):
        return tokenize_standard_folding(pd.Series([text])).iloc[0]

    assert ftoks("Café naïve RÉSUMÉ") == ["cafe", "naive", "resume"]
    assert ftoks("Æther œuvre straße") == ["aether", "oeuvre", "strasse"]
    assert ftoks("Łódź Ħal Þing") == ["lodz", "hal", "thing"]
    # folding precedes the stop filter: thé -> the -> stopped
    assert ftoks("thé quick") == ["quick"]
    # CJK untouched by folding
    assert ftoks("café 東京") == ["cafe", "東", "京"]


def test_fold_jvm_engine_parity(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.analyzers import (
        tokenize_standard_folding,
        tokenize_standard_folding_with_positions,
    )
    from lucene_solr_spark.analysis.jvm import (
        standard_folding_tokens_col,
        standard_folding_tokens_pos_col,
    )

    texts = ["Café naïve RÉSUMÉ Æther œuvre straße Łódź 東京 O'Neil's", ""]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    jvm = [
        r[0] for r in df.select(standard_folding_tokens_col(F.col("text"))).collect()
    ]
    assert jvm == list(tokenize_standard_folding(pd.Series(texts)))
    jvm_p = [
        [(s["term"], s["pos"]) for s in r[0]]
        for r in df.select(standard_folding_tokens_pos_col(F.col("text"))).collect()
    ]
    assert jvm_p == list(tokenize_standard_folding_with_positions(pd.Series(texts)))


def test_folding_end_to_end_search(spark, tmp_path):
    """analyzer='standard_folding' at build time: querying the folded
    form matches accented documents."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.searcher import IndexSearcher
    from lucene_solr_spark.search.query import TermQuery

    rows = [(0, "Café résumé"), (1, "cafe plain"), (2, "unrelated words")]
    src = spark.createDataFrame(rows, ["doc_id", "text"])
    out = str(tmp_path / "fold_ix")
    build_index(
        spark, src, out,
        IndexConfig(n_shards=2, segs_per_shard=1, analyzer="standard_folding"),
    )
    s = IndexSearcher(spark, out)
    assert sorted(r.doc_id for r in s.search(TermQuery("cafe"), k=5).collect()) == [0, 1]
    assert [r.doc_id for r in s.search(TermQuery("resume"), k=5).collect()] == [0]
    assert s.search(TermQuery("café"), k=5).collect() == []  # post-analysis terms


# --- ShingleFilter analog (analyzer="shingle": unigrams + bigrams) ---


def test_shingle_tokens_and_positions():
    from lucene_solr_spark.analysis.analyzers import (
        tokenize_shingle,
        tokenize_shingle_with_positions,
    )

    assert tokenize_shingle(pd.Series(["The Quick fox"])).iloc[0] == [
        "the", "quick", "fox", "the quick", "quick fox",
    ]  # no stop filter in the shingle chain; shingle at first token's pos
    assert tokenize_shingle_with_positions(pd.Series(["a b"])).iloc[0] == [
        ("a", 0), ("b", 1), ("a b", 0),
    ]
    assert tokenize_shingle(pd.Series(["solo"])).iloc[0] == ["solo"]
    assert tokenize_shingle(pd.Series([""])).iloc[0] == []


def test_shingle_jvm_parity(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.analyzers import (
        tokenize_shingle,
        tokenize_shingle_with_positions,
    )
    from lucene_solr_spark.analysis.jvm import (
        shingle_tokens_col,
        shingle_tokens_pos_col,
    )

    texts = ["The Quick Brown fox", "one", "", "中文 mixed words"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    j = [r[0] for r in df.select(shingle_tokens_col(F.col("text"))).collect()]
    assert j == list(tokenize_shingle(pd.Series(texts)))
    jp = [
        [(s["term"], s["pos"]) for s in r[0]]
        for r in df.select(shingle_tokens_pos_col(F.col("text"))).collect()
    ]
    assert jp == list(tokenize_shingle_with_positions(pd.Series(texts)))


def test_shingle_phrase_as_term_search(spark, tmp_path):
    """The shingle index answers a phrase as ONE term seek — Lucene's
    shingle/CommonGrams phrase-acceleration pattern."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.searcher import IndexSearcher
    from lucene_solr_spark.search.query import TermQuery

    rows = [
        (0, "full table scan is slow"),
        (1, "scan the table"),       # "table scan" bigram absent
        (2, "table scan table scan"),  # tf=2
    ]
    src = spark.createDataFrame(rows, ["doc_id", "text"])
    out = str(tmp_path / "sh_ix")
    build_index(
        spark, src, out, IndexConfig(n_shards=2, segs_per_shard=1, analyzer="shingle")
    )
    s = IndexSearcher(spark, out)
    hits = [r.doc_id for r in s.search(TermQuery("table scan"), k=5).collect()]
    assert hits[0] == 2 and set(hits) == {0, 2}


# --- WordDelimiterFilter analog (analyzer="word_delimiter") ---


def test_word_delimiter_goldens():
    from lucene_solr_spark.analysis.analyzers import (
        tokenize_word_delimiter,
        tokenize_word_delimiter_with_positions,
    )

    cases = {
        "wi-fi": ["wi", "fi"],
        "powerShell": ["power", "shell"],
        "XMLParser": ["xml", "parser"],
        "src7": ["src", "7"],
        "j2se": ["j", "2", "se"],
        "O'Neil's": ["o", "neil", "s"],
        "500-42": ["500", "42"],
        "snake_case_id": ["snake", "case", "id"],
        "de-src7 plain": ["de", "src", "7", "plain"],
        "": [],
        "---": [],
    }
    for text, want in cases.items():
        got = tokenize_word_delimiter(pd.Series([text])).iloc[0]
        assert got == want, (text, got)
    # every part consumes one position (posIncr 1, renumbered stream)
    assert tokenize_word_delimiter_with_positions(
        pd.Series(["wi-fi hotSpot"])
    ).iloc[0] == [("wi", 0), ("fi", 1), ("hot", 2), ("spot", 3)]


def test_word_delimiter_jvm_parity(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.analyzers import (
        tokenize_word_delimiter,
        tokenize_word_delimiter_with_positions,
    )
    from lucene_solr_spark.analysis.jvm import (
        word_delimiter_tokens_col,
        word_delimiter_tokens_pos_col,
    )

    texts = [
        "wi-fi powerShell XMLParser src7 j2se",
        "O'Neil's 500-42 snake_case",
        "",
        "---",
        "MixedCASEWords under_score42",
        "tab\tand\nnewline splits too",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    j = [r[0] for r in df.select(word_delimiter_tokens_col(F.col("text"))).collect()]
    p = list(tokenize_word_delimiter(pd.Series(texts)))
    assert j == p
    jp = [
        [(s["term"], s["pos"]) for s in r[0]]
        for r in df.select(word_delimiter_tokens_pos_col(F.col("text"))).collect()
    ]
    pp = list(tokenize_word_delimiter_with_positions(pd.Series(texts)))
    assert jp == [list(x) for x in pp]


# --- EdgeNGramTokenFilter analog (analyzer="edge_ngram") ---


def test_edge_ngram_tokens_and_positions():
    from lucene_solr_spark.analysis.analyzers import (
        tokenize_edge_ngram,
        tokenize_edge_ngram_with_positions,
    )

    assert tokenize_edge_ngram(pd.Series(["cab"])).iloc[0] == [
        "c", "ca", "cab",
    ]
    # grams share the SOURCE token's position; stops advance it
    assert tokenize_edge_ngram_with_positions(
        pd.Series(["the cab hi"])
    ).iloc[0] == [("c", 1), ("ca", 1), ("cab", 1), ("h", 2), ("hi", 2)]
    # maxGram caps the prefixes
    got = tokenize_edge_ngram(pd.Series(["extraordinarily"])).iloc[0]
    assert len(got) == 10 and got[-1] == "extraordin"


def test_edge_ngram_jvm_parity(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.analyzers import (
        tokenize_edge_ngram,
        tokenize_edge_ngram_with_positions,
    )
    from lucene_solr_spark.analysis.jvm import (
        edge_ngram_tokens_col,
        edge_ngram_tokens_pos_col,
    )

    texts = [
        "The Quick brown fox",
        "extraordinarily long words here",
        "",
        "o'neil's café 42",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    j = [r[0] for r in df.select(edge_ngram_tokens_col(F.col("text"))).collect()]
    p = list(tokenize_edge_ngram(pd.Series(texts)))
    assert j == p
    jp = [
        [(s["term"], s["pos"]) for s in r[0]]
        for r in df.select(edge_ngram_tokens_pos_col(F.col("text"))).collect()
    ]
    pp = list(tokenize_edge_ngram_with_positions(pd.Series(texts)))
    assert jp == [list(x) for x in pp]
