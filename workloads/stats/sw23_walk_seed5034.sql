-- generated: QueryGenerator.statsWalkQuery(seed = 5034,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM embeddings v1, documents d1, documents d2 WHERE d1.doc_id = v1.vec_id AND d2.doc_id = v1.vec_id AND v1.label > 1 AND d2.n_chars > 100
