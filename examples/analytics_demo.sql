-- README-style analytics (mirrors /root/reference/README.md:204-287) over
-- the testdata documents table: standardize, roll up, filter, crack the
-- composite output, query through a view.

CREATE OR REPLACE TEMPORARY VIEW standardized_docs AS
SELECT doc_id,
       lang,
       standardize_title(substr(text, 1, 40)) AS standardized_title
FROM documents;

SELECT standardized_title,
       COUNT(*) AS doc_count,
       COUNT(DISTINCT lang) AS n_langs
FROM standardized_docs
GROUP BY standardized_title
ORDER BY doc_count DESC, standardized_title
LIMIT 10;

SELECT doc_id, standardized_title
FROM standardized_docs
WHERE standardized_title LIKE '%Worker%'
ORDER BY doc_id
LIMIT 10;

SELECT split_part(standardized_title, ' - ', 2) AS bls_category,
       COUNT(*) AS n
FROM standardized_docs
GROUP BY bls_category
ORDER BY n DESC, bls_category
LIMIT 10;
