"""Unit tests for the parity-critical parsers (SURVEY §2.3 M9-M11).

Boundary-rule cases mirror the examples the reference's comments call out
(base_processor.py:1279-1293): EB1 vs RHEB, PSD vs PSD-95.
"""

from bioie_llm_ray.functions.parsing import (
    parse_choice_response,
    parse_containment_response,
    parse_entity_response,
)


class TestEntityParser:
    def test_simple_match(self):
        assert parse_entity_response("TP53 binds MDM2", ["TP53", "MDM2"]) == [
            "TP53",
            "MDM2",
        ]

    def test_boundary_prev_char(self):
        # EB1 inside RHEB1? 'RHEB' contains 'EB' — EB1 must not match inside RHEB1
        assert parse_entity_response("RHEB1 is active", ["EB1"]) == []

    def test_boundary_next_char(self):
        # PSD must not match inside PSD-95 (hyphen counts as part of the name)
        assert parse_entity_response("PSD-95 is a scaffold", ["PSD"]) == []
        assert parse_entity_response("PSD-95 is a scaffold", ["PSD-95"]) == ["PSD-95"]

    def test_underscore_boundary(self):
        assert parse_entity_response("x GENE_A y", ["GENE"]) == []

    def test_punctuation_is_clean_boundary(self):
        assert parse_entity_response("binds TP53, MDM2.", ["TP53", "MDM2"]) == [
            "TP53",
            "MDM2",
        ]

    def test_second_occurrence_accepted(self):
        # first occurrence dirty, later occurrence clean → accepted
        assert parse_entity_response("xTP53x then TP53 alone", ["TP53"]) == ["TP53"]

    def test_gold_order_preserved(self):
        out = parse_entity_response("B then A", ["A", "B"])
        assert out == ["A", "B"]

    def test_regex_metachars_in_gold(self):
        # gold names are escaped — '(' etc. must not crash or misparse
        assert parse_entity_response("GENE(1) here", ["GENE(1)"]) == ["GENE(1)"]

    def test_empty_response(self):
        assert parse_entity_response("", ["TP53"]) == []


class TestChoiceParser:
    CHOICES = ["yes", "no"]

    def test_direct(self):
        assert parse_choice_response("Yes", self.CHOICES) == "yes"

    def test_with_noise_tokens(self):
        assert parse_choice_response("Answer: no, clearly", self.CHOICES) == "no"

    def test_strips_non_alpha(self):
        assert parse_choice_response("(yes)", self.CHOICES) == "yes"

    def test_none_fallback(self):
        assert parse_choice_response("maybe perhaps", self.CHOICES) == "none"

    def test_first_match_wins(self):
        assert parse_choice_response("no yes", self.CHOICES) == "no"

    def test_relation_types(self):
        choices = ["Activation", "Inhibition", "Phosphorylation"]
        assert (
            parse_choice_response("The answer is: Inhibition.", choices)
            == "inhibition"
        )


class TestContainmentParser:
    def test_single_hit(self):
        assert (
            parse_containment_response("it is an activation event", "GENE", ["Activation", "Inhibition"])
            == "activation"
        )

    def test_entity_removed_before_scan(self):
        # entity name containing a choice must not produce a false hit
        assert (
            parse_containment_response("ActivationGene is here", "activationgene", ["Activation"])
            == "None"
        )

    def test_multi_hit_disambiguated_by_gold(self):
        out = parse_containment_response(
            "activation and inhibition", "G", ["Activation", "Inhibition"], gold="inhibition"
        )
        assert out == "inhibition"

    def test_multi_hit_without_gold(self):
        out = parse_containment_response(
            "activation and inhibition", "G", ["Activation", "Inhibition"]
        )
        assert out == "None"
