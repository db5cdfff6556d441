-- generated: QueryGenerator.statsWalkQuery(seed = 5072,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, documents d2, embeddings v1, documents d3 WHERE d2.lang = d1.lang AND v1.vec_id = d1.doc_id AND d3.lang = d1.lang AND d1.lang = 'en' AND d1.source <> 'src1' AND d2.n_chars < 300
