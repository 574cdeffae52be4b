"""Cross-module oracle-SQL contract constants.

Shared by catalog modules whose oracles must agree bit-for-bit on a
heuristic's definition (the english-detector predicate is consumed by
frontier3's scorecard/confusion rows AND frontier9's MCC row).  Living in
a leaf module keeps importers free of catalog-module ordering concerns —
importing a catalog sibling at module level would replay load_all's
dependency chain (frontier3 needs analytics needs extensions), which is
exactly the import-order trap this module exists to avoid.
"""

# The english-detector predicate (text_lang_id's stopword-ratio heuristic
# in DuckDB SQL): >= 4% of whitespace tokens drawn from the 7 top English
# stopwords.  Must match operators/text_analysis.py lang_id exactly.
LANGID_PRED_SQL = """
      CASE WHEN CAST(len(list_filter(string_split_regex(text, '\\s+'),
             t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
             / CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) >= 0.04
           THEN 'en' ELSE 'unk' END
"""
