-- generated: QueryGenerator.statsWalkQuery(seed = 5055,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, documents d2, documents d3, embeddings v1, embeddings v2, embeddings v3 WHERE d2.lang = d1.lang AND d3.lang = d1.lang AND v1.vec_id = d2.doc_id AND v2.vec_id = d3.doc_id AND v3.vec_id = d1.doc_id AND d2.n_chars < 200 AND d1.source = 'src9' AND d3.source <> 'src10'
