"""English stop words.

The 33-word standard English list shipped by the reference default configset
(solr/server/solr/configsets/_default/conf/lang/stopwords_en.txt, which in
turn takes them from Lucene's StopAnalyzer).  The stop filter runs with
ignoreCase=true BEFORE the lowercase filter in the default text_general
chain (managed-schema.xml:299-315).
"""

ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)
