-- generated: QueryGenerator.statsWalkQuery(seed = 5050,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM embeddings v1, documents d1, embeddings v2, embeddings v3 WHERE d1.doc_id = v1.vec_id AND v2.label = v1.label AND v3.label = v2.label AND d1.source = 'src5' AND v3.label > 3 AND d1.n_chars < 200 AND v1.label > 0
