-- generated: QueryGenerator.statsWalkQuery(seed = 5020,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, embeddings v1, embeddings v2, embeddings v3, documents d2 WHERE v1.vec_id = d1.doc_id AND v2.vec_id = d1.doc_id AND v3.label = v2.label AND d2.doc_id = v2.vec_id AND d1.n_chars > 250 AND v1.label > 1 AND d1.lang = 'es'
