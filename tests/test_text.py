import pytest

from metatts_tpu.text import text_to_sequence, sequence_to_text
from metatts_tpu.text.symbols import symbols, symbol_to_id
from metatts_tpu.text.numbers import normalize_numbers, number_to_words


def test_symbol_inventory_matches_reference():
    # Reference: text/symbols.py builds 360 symbols; model vocab is 361.
    assert len(symbols) == 360
    assert symbols[0] == "_"
    assert symbols[1] == "-"
    # spot-check IDs at the section boundaries
    assert symbols[2:12] == list("!'(),.:;? ")
    assert symbols[12] == "A"
    assert symbols[64] == "@AA"        # first ARPAbet
    assert symbols[64 + 84] == "@b"    # first pinyin
    assert symbols[-3:] == ["@sp", "@spn", "@sil"]
    assert len(set(symbols)) == 360    # uniqueness


def test_text_to_sequence_braces():
    seq = text_to_sequence("{HH AH0 L OW1} world!", ["english_cleaners"])
    assert seq[0] == symbol_to_id["@HH"]
    assert seq[1] == symbol_to_id["@AH0"]
    # round trip
    assert "{HH}" in sequence_to_text([symbol_to_id["@HH"]])


def test_text_to_sequence_plain():
    seq = text_to_sequence("Hi.", ["english_cleaners"])
    assert seq == [symbol_to_id[c] for c in "hi."]


def test_cleaner_numbers():
    assert normalize_numbers("in 1985 he") == "in nineteen eighty-five he"
    assert normalize_numbers("2000") == "two thousand"
    assert normalize_numbers("2008") == "two thousand eight"
    assert normalize_numbers("1500") == "fifteen hundred"
    assert normalize_numbers("$1.50") == "one dollar, fifty cents"
    assert normalize_numbers("3rd") == "third"
    assert normalize_numbers("21st") == "twenty-first"
    # 1000 < n < 3000 reads year-style (inflect group=2 in the reference)
    assert normalize_numbers("1,234 things") == "twelve thirty-four things"
    assert normalize_numbers("3,456") == "three thousand, four hundred fifty-six"
    assert number_to_words(1234567) == (
        "one million, two hundred thirty-four thousand, five hundred sixty-seven")


def test_cleaner_pipeline():
    seq1 = text_to_sequence("Dr. Smith, 42!", ["english_cleaners"])
    seq2 = text_to_sequence("doctor smith, forty-two!", ["english_cleaners"])
    assert seq1 == seq2


def test_unknown_cleaner_raises():
    with pytest.raises(ValueError):
        text_to_sequence("x", ["nope_cleaners"])
