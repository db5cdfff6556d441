SELECT d1.lang, count(*) AS n_pairs
FROM documents d1, documents d2
WHERE d1.lang = d2.lang AND d1.doc_id < d2.doc_id
  AND d1.source = 'src1' AND d2.source = 'src2'
  AND d1.n_chars BETWEEN 150 AND 450
  AND d2.n_chars BETWEEN 150 AND 450
GROUP BY d1.lang ORDER BY d1.lang
