-- generated: QueryGenerator.statsWalkQuery(seed = 5087,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, documents d2, embeddings v1, embeddings v2, embeddings v3 WHERE d2.lang = d1.lang AND v1.vec_id = d1.doc_id AND v2.label = v1.label AND v3.vec_id = d2.doc_id AND d2.n_chars < 450 AND d2.source = 'src3' AND d1.n_chars > 100 AND v3.label > 7 AND d2.lang <> 'de'
