-- generated: QueryGenerator.statsWalkQuery(seed = 5519,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, embeddings v1, documents d2, documents d3, embeddings v2 WHERE v1.vec_id = d1.doc_id AND d2.doc_id = v1.vec_id AND d3.doc_id = v1.vec_id AND v2.vec_id = d1.doc_id AND d3.source = 'src6' AND d1.n_chars < 150
