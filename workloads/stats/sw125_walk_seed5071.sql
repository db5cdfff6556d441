-- generated: QueryGenerator.statsWalkQuery(seed = 5071,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, embeddings v1, documents d2, embeddings v2 WHERE v1.vec_id = d1.doc_id AND d2.lang = d1.lang AND v2.vec_id = d1.doc_id AND d2.lang <> 'zh' AND d1.lang <> 'fr' AND d2.source = 'src7'
